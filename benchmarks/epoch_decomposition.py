#!/usr/bin/env python
"""Epoch wall-time decomposition for the three training harnesses.

Round-3 verdict task 1 "done" criterion: a committed artifact decomposing
the training-epoch wall into device compute vs host overhead at the
reference-scale configs (B=4, 1024 pts, human_views data), with epoch wall
<= 1.5x device time now that epochs run as one scanned device program over
the device-resident dataset (train/harness.py + data/dataset.py
DeviceCache). Round 3 measured the OLD streaming path at ~3-5x device time
(FMR: 152 ms/step wall vs 27.6 ms device step).

For each harness this measures, on the current default device:
- device train-step ms (jitted step, steady state),
- device eval-step ms,
- steady-state epoch wall (median of the last epochs of a short
  Trainer.fit, read back from the run's metrics.jsonl time/epoch_seconds),
- the implied device compute per epoch and the wall/device ratio.

Writes benchmarks/EPOCH_DECOMP.json.

Usage: python benchmarks/epoch_decomposition.py [--models dcp,rpm,fmr]
       [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def timeit(f, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def epoch_walls(exp_dir):
    walls = []
    path = os.path.join(exp_dir, "logs", "metrics.jsonl")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "time/epoch_seconds":
                walls.append(float(rec["value"]))
    return walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcp,rpm,fmr")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--exp_root", default="/tmp/arrl_epoch_decomp")
    ap.add_argument("--out", default=os.path.join(HERE, "EPOCH_DECOMP.json"))
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

    import numpy as np

    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.train import harness as H
    from a_robust_registration_loss_tpu.train import losses as L
    from benchmarks.train_convergence import ensure_dataset

    data_dir = os.path.join(REPO, "datasets", "human_views")
    ensure_dataset(data_dir)

    results = {"backend": args.backend,
               "device": str(jax.devices()[0]),
               "config": {"batch": args.batch, "n_points": 1024,
                          "data": "human_views (train_count=48)"},
               "harnesses": {}}

    for name in args.models.split(","):
        mk = dict(data_path=data_dir, layout="views", train_batch=args.batch,
                  seed=1234, train_count=48)
        exp_dir = os.path.join(args.exp_root, f"exp_{name}")
        import shutil

        shutil.rmtree(exp_dir, ignore_errors=True)
        fit = H.FitConfig(epochs=args.epochs, exp_dir=exp_dir, seed=1234,
                          save_every=0, artifacts_every=0,
                          log_tensorboard=False, resume=False)

        if name == "dcp":
            from a_robust_registration_loss_tpu.models.dcp import DCPConfig
            from a_robust_registration_loss_tpu.train import dcp as TD

            train_loader, test_loader = DS.generate_datasets(
                DS.DatasetConfig(dcp=True, **mk))
            cfg = TD.DCPTrainConfig(
                lr=1e-4, loss=L.LossConfig(n_lines=15000,
                                           backend=args.backend),
                model=DCPConfig(emb_nn="dgcnn"), fit=fit)
            model, opt, train_step, eval_step, _, _ = TD.make_steps(cfg)
            init = TD.init_params
            train_mod = TD
        elif name == "rpm":
            from a_robust_registration_loss_tpu.models.rpmnet import (
                RPMNetConfig,
            )
            from a_robust_registration_loss_tpu.train import rpmnet as TR

            train_loader, test_loader = DS.generate_datasets(
                DS.DatasetConfig(**mk))
            cfg = TR.RPMTrainConfig(
                pretrain_epochs=0,
                loss=L.LossConfig(n_lines=10000, backend=args.backend),
                model=RPMNetConfig(), fit=fit)
            model, opt, train_step, eval_step, _, _ = TR.make_steps(cfg)
            init = TR.init_params
            train_mod = TR
        elif name == "fmr":
            from a_robust_registration_loss_tpu.train import fmr as TF

            train_loader, test_loader = DS.generate_datasets(
                DS.DatasetConfig(fmr=True, **mk))
            b0 = next(iter(train_loader))
            cfg = TF.FMRTrainConfig(
                lr=1e-6, loss=L.LossConfig(n_lines=15000,
                                           backend=args.backend),
                model=TF.FMRConfig(
                    num_points=b0["points_src_sample"].shape[1]),
                fit=fit)
            model, opt, train_step, eval_step, _ = TF.make_steps(cfg)
            init = TF.init_params
            train_mod = TF
        else:
            raise SystemExit(f"unknown harness {name}")

        # --- device step times (data as ARGS; axon dispatch note) ---------
        cache = DS.maybe_device_cache(train_loader)
        assert isinstance(cache, DS.DeviceCache), "dataset not cacheable?"
        data, full_idx, _ = cache.device_epoch(0)
        batch = cache.gather(full_idx[0])
        params = init(model, jax.random.PRNGKey(0), batch)
        opt_state = opt.init(params)
        key = np.asarray(jax.random.PRNGKey(1), np.uint32)
        jstep = jax.jit(train_step)
        train_ms = timeit(jstep, params, opt_state, batch, key)
        jeval = jax.jit(eval_step)
        ecache = DS.maybe_device_cache(test_loader)
        edata, eidx, erem = ecache.device_epoch(0)
        ebatch = ecache.gather(eidx[0] if len(eidx) else erem)
        eval_ms = timeit(jeval, params, ebatch, key)

        # --- steady-state epoch wall through the real Trainer.fit ---------
        t_fit = time.time()
        train_mod.train(cfg, train_loader, test_loader, log=lambda *a: None)
        fit_wall = time.time() - t_fit
        walls = epoch_walls(exp_dir)
        steady = sorted(walls[2:])[: max(1, (len(walls) - 2) // 2 + 1)]
        epoch_wall_ms = 1000 * float(np.median(steady))

        n_train = len(cache)
        n_eval = len(ecache) if hasattr(ecache, "__len__") else 0
        device_ms = n_train * train_ms + n_eval * eval_ms
        rec = {
            "train_step_ms": round(train_ms, 2),
            "eval_step_ms": round(eval_ms, 2),
            "train_batches_per_epoch": n_train,
            "eval_batches_per_epoch": n_eval,
            "device_ms_per_epoch": round(device_ms, 1),
            "epoch_wall_ms": round(epoch_wall_ms, 1),
            "wall_over_device": round(epoch_wall_ms / device_ms, 3),
            "fit_wall_s_total": round(fit_wall, 1),
            "epoch_walls_s": [round(w, 3) for w in walls],
        }
        results["harnesses"][name] = rec
        print(json.dumps({"harness": name, **rec}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
