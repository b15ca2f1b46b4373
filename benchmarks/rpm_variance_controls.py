#!/usr/bin/env python
"""Paired JAX streams for the RPM basin-sensitivity control (round-2 verdict
task 2b).

benchmarks/rpm_torch_control.py trains the ACTUAL torch reference harness at
a REDUCED protocol (the full 1024-pt/10k-line protocol is CPU-infeasible for
torch in this environment — no CUDA, one core). This script runs our JAX
harness at the IDENTICAL reduced protocol — same dataset builder, same
train/test split, same batch size, line count, epoch and identity-pretrain
budgets — so the seed-to-seed spread comparison is like-for-like.

The held-out metric is the harness's own final-epoch
``test_loss_rot_euler_rmse`` (eval_step's per-batch rotation-euler RMSE,
averaged over test batches) — the same aggregation rpm_torch_control.py
reports.

Usage:
  python benchmarks/rpm_variance_controls.py --seed 1234 \
      --out benchmarks/_jax_control_1234.json
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=None,
                    help="default datasets/human_views_<num_points>")
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--n_views", type=int, default=10)
    ap.add_argument("--train_count", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_lines", type=int, default=2000)
    ap.add_argument("--pretrain_epochs", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--exp_dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.train import harness as H
    from a_robust_registration_loss_tpu.train import losses as L
    from a_robust_registration_loss_tpu.train import rpmnet as TR
    from benchmarks.train_convergence import ensure_dataset

    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")
    data_dir = args.data_dir or os.path.join(
        REPO, "datasets", f"human_views_{args.num_points}")
    ensure_dataset(data_dir, n_views=args.n_views,
                   num_points=args.num_points)
    # identical loader construction to rpm_torch_control.py — same
    # n_meshes/n_views/split so the comparison is pair-for-pair
    n_meshes = len({f.split("_")[2] for f in os.listdir(data_dir)
                    if f.startswith("src_sample_")})
    train_loader, test_loader = DS.generate_datasets(DS.DatasetConfig(
        data_path=data_dir, layout="views", n_meshes=n_meshes,
        n_views=args.n_views, train_batch=args.batch_size,
        seed=args.seed, train_count=args.train_count))

    exp_dir = args.exp_dir or os.path.join(
        REPO, "exps", f"rpm_control_{args.num_points}_{args.seed}")
    cfg = TR.RPMTrainConfig(
        pretrain_epochs=args.pretrain_epochs,
        loss=L.LossConfig(n_lines=args.n_lines, backend=args.backend),
        fit=H.FitConfig(epochs=args.epochs, exp_dir=exp_dir, seed=args.seed,
                        artifacts_every=0, save_every=0,
                        log_tensorboard=False),
    )

    state = {"n": 0}

    def log(msg):
        if msg.startswith("epoch "):
            state["n"] += 1
            if state["n"] % 10 != 1:
                return
        print(msg, flush=True)

    t0 = time.time()
    params, history = TR.train(cfg, train_loader, test_loader, log=log)
    rmse = float(history[-1]["test_loss_rot_euler_rmse"])
    chamfer = float(history[-1]["test_loss_chamfer"])
    out = {
        "framework": "jax (this repo)",
        "seed": args.seed,
        "backend": args.backend,
        "protocol": f"{args.num_points}pt views x{args.n_views}, "
                    f"{args.train_count} train, batch {args.batch_size}, "
                    f"{args.n_lines} lines, {args.epochs} epochs, "
                    f"pretrain {args.pretrain_epochs}@2e-3",
        "rot_rmse_deg": rmse,
        "chamfer": chamfer,
        "final_train_loss": float(history[-1]["loss"]),
        "wall_seconds": time.time() - t0,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
