#!/usr/bin/env python
"""The reference's ACTUAL DCP protocol, end to end (round-3 verdict task 2).

The reference does NOT train DCP from scratch with the intersection loss:
it loads a supervised-pretrained DCP checkpoint
(/root/reference/code/exps_deep_learning/dcp/Train_DCP.py:890-893) and
fine-tunes it UNSUPERVISED with the intersection loss at Adam lr 1e-6
(:553) — "supervised pipelines made unsupervised" is the paper's headline
use case. The reference's checkpoint blob is external, so the supervised
init is produced in-repo: a supervised pretrain on the GT transform the
dataset contract already carries (train/dcp.py pretrain_step, optimizing
the reference's logged-only loss_gt, Train_DCP.py:393-397).

Phases (both on the human_views dataset, 48 train / 12 held out):
  A. supervised pretrain (--pretrain_epochs at --pretrain_lr), then the
     full held-out eval battery -> the supervised-init endpoint;
  B. unsupervised intersection fine-tune at lr 1e-6 from that init
     (--epochs), then the same battery -> the final endpoint.

Writes benchmarks/TRAINING_dcp_pretrained.json with both endpoints and the
fine-tune per-epoch curves; tests/test_training_artifact.py asserts the
endpoint bars.

Usage: python benchmarks/dcp_pretrained_protocol.py
       [--pretrain_epochs 150] [--epochs 600]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_epochs", type=int, default=150)
    ap.add_argument("--pretrain_lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-6)   # Train_DCP.py:553
    ap.add_argument("--emb_nn", default="dgcnn")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--exp_dir", default=os.path.join(REPO, "exps",
                                                      "dcp_pretrained"))
    ap.add_argument("--out", default=os.path.join(
        HERE, "TRAINING_dcp_pretrained.json"))
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/arrl_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")

    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.models.dcp import DCPConfig
    from a_robust_registration_loss_tpu.train import dcp as TD
    from a_robust_registration_loss_tpu.train import harness as H
    from a_robust_registration_loss_tpu.train import losses as L
    from benchmarks.train_convergence import ensure_dataset

    data_dir = os.path.join(REPO, "datasets", "human_views")
    ensure_dataset(data_dir)
    shutil.rmtree(args.exp_dir, ignore_errors=True)

    mk = DS.DatasetConfig(data_path=data_dir, layout="views", train_batch=4,
                          seed=args.seed, train_count=48, dcp=True)
    t0 = time.time()

    def make_cfg(epochs, pretrain_epochs, tag):
        return TD.DCPTrainConfig(
            lr=args.lr,
            pretrain_epochs=pretrain_epochs, pretrain_lr=args.pretrain_lr,
            loss=L.LossConfig(n_lines=15000, backend=args.backend),
            model=DCPConfig(emb_nn=args.emb_nn),
            fit=H.FitConfig(epochs=epochs, seed=args.seed,
                            exp_dir=os.path.join(args.exp_dir, tag),
                            save_every=50, artifacts_every=0,
                            log_tensorboard=False, resume=False),
        )

    state = {"n": 0}

    def log(msg):
        state["n"] += 1
        if state["n"] % 25 == 1 or not msg.startswith(("epoch", "[pretrain")):
            print(msg, flush=True)

    # ---- Phase A: supervised pretrain only (epochs=0 skips the main fit)
    cfg_a = make_cfg(epochs=0, pretrain_epochs=args.pretrain_epochs, tag="a")
    train_loader, test_loader = DS.generate_datasets(mk)
    params, _ = TD.train(cfg_a, train_loader, test_loader, log=log)
    sup_eval = TD.evaluate(cfg_a, params, test_loader,
                           os.path.join(args.exp_dir, "eval_supervised"),
                           log=log, save_objs=False)

    # ---- Phase B: unsupervised intersection fine-tune at lr 1e-6
    cfg_b = make_cfg(epochs=args.epochs, pretrain_epochs=0, tag="b")
    train_loader, test_loader = DS.generate_datasets(mk)
    params, history = TD.train(cfg_b, train_loader, test_loader,
                               init_from=params, log=log)
    fin_eval = TD.evaluate(cfg_b, params, test_loader,
                           os.path.join(args.exp_dir, "eval_finetuned"),
                           log=log, epoch=args.epochs - 1, save_objs=False)

    keys = sorted({k for h in history for k in h if k != "epoch"})
    result = {
        "protocol": {
            "reference": "Train_DCP.py:553 (Adam lr 1e-6), :890-893 "
                         "(pretrained init)",
            "pretrain_epochs": args.pretrain_epochs,
            "pretrain_lr": args.pretrain_lr,
            "finetune_epochs": args.epochs, "finetune_lr": args.lr,
            "emb_nn": args.emb_nn, "n_lines": 15000, "batch": 4,
            "data": "human_views 48 train / 12 held out",
        },
        "backend": args.backend,
        "supervised_init_eval": {k: float(v) for k, v in sup_eval.items()},
        "finetuned_eval": {k: float(v) for k, v in fin_eval.items()},
        "per_epoch": {
            "epoch": [h["epoch"] for h in history],
            **{k: [float(h.get(k, float("nan"))) for h in history]
               for k in keys},
        },
        "wall_seconds": time.time() - t0,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    for k in ("r_rmse_ab", "r_mae_ab", "t_rmse_ab", "loss_intersection",
              "loss_chamfer", "loss_pp_wise"):
        result.setdefault("deltas", {})[k] = {
            "supervised": float(sup_eval[k]), "finetuned": float(fin_eval[k]),
            "improved": bool(fin_eval[k] < sup_eval[k]),
        }

    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"wrote {args.out}")
    print(json.dumps(result["deltas"], indent=1))


if __name__ == "__main__":
    main()
