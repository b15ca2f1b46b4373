#!/usr/bin/env python
"""Mixed-precision (bfloat16) training mode: step-time + convergence artifact.

The model configs' `dtype` field (trainers' `--dtype bfloat16`) runs the
embedding/feature nets in bf16 on the MXU while params, norm statistics,
softmaxes, SVD/Kabsch/IC solvers, and the intersection metric stay fp32.
The torch reference is fp32-only (no comparable mode).

This driver records, on the current default device:
- fp32 vs bf16 train-step ms for the three harnesses at reference scale
  (B=4, 1024 pts, human_views data, the same configs as EPOCH_DECOMP.json);
- a convergence sanity for DCP: two short Trainer.fit runs from the SAME
  init (identical fp32 param trees — bf16 is compute-only), comparing the
  train-loss trajectories and final held-out eval.

Writes benchmarks/MIXED_PRECISION.json.

Usage: python benchmarks/mixed_precision.py [--models dcp,rpm,fmr]
       [--conv_epochs 40]
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


def timeit(f, *args, n=15, warmup=3):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def _harness(name, dtype, backend, fit):
    """(cfg, make_steps, init_params, loader-kwargs-extra) per harness,
    mirroring epoch_decomposition.py's reference-scale configs."""
    from a_robust_registration_loss_tpu.train import losses as L

    if name == "dcp":
        from a_robust_registration_loss_tpu.models.dcp import DCPConfig
        from a_robust_registration_loss_tpu.train import dcp as TD

        cfg = TD.DCPTrainConfig(
            lr=1e-4, loss=L.LossConfig(n_lines=15000, backend=backend),
            model=DCPConfig(emb_nn="dgcnn", dtype=dtype), fit=fit)
        return cfg, TD, dict(dcp=True)
    if name == "rpm":
        from a_robust_registration_loss_tpu.models.rpmnet import RPMNetConfig
        from a_robust_registration_loss_tpu.train import rpmnet as TR

        cfg = TR.RPMTrainConfig(
            pretrain_epochs=0,
            loss=L.LossConfig(n_lines=10000, backend=backend),
            model=RPMNetConfig(dtype=dtype), fit=fit)
        return cfg, TR, dict()
    if name == "fmr":
        from a_robust_registration_loss_tpu.train import fmr as TF

        cfg = TF.FMRTrainConfig(
            lr=1e-6, loss=L.LossConfig(n_lines=15000, backend=backend),
            model=TF.FMRConfig(num_points=1024, dtype=dtype), fit=fit)
        return cfg, TF, dict(fmr=True)
    raise SystemExit(f"unknown harness {name}")


def tag_series(exp_dir, tag):
    out = []
    with open(os.path.join(exp_dir, "logs", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == tag:
                out.append(float(rec["value"]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcp,rpm,fmr")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--conv_epochs", type=int, default=40)
    ap.add_argument("--exp_root", default="/tmp/arrl_mixed_precision")
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "MIXED_PRECISION.json"))
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
    from benchmarks.train_convergence import ensure_dataset

    data_dir = os.path.join(REPO, "datasets", "human_views")
    ensure_dataset(data_dir)
    mk = dict(data_path=data_dir, layout="views", train_batch=args.batch,
              seed=1234, train_count=48)

    results = {"backend": args.backend, "device": str(jax.devices()[0]),
               "config": {"batch": args.batch, "n_points": 1024,
                          "data": "human_views (train_count=48)"},
               "steps": {}, "convergence": {}}

    fit0 = H.FitConfig(epochs=1, exp_dir="/tmp/arrl_mp_unused", seed=1234,
                       save_every=0, artifacts_every=0,
                       log_tensorboard=False, resume=False)

    for name in args.models.split(","):
        cfg32, mod, extra = _harness(name, "float32", args.backend, fit0)
        cfgbf, _, _ = _harness(name, "bfloat16", args.backend, fit0)
        train_loader, _ = DS.generate_datasets(DS.DatasetConfig(**extra, **mk))
        cache = DS.maybe_device_cache(train_loader)
        _, full_idx, _ = cache.device_epoch(0)
        batch = cache.gather(full_idx[0])
        key = np.asarray(jax.random.PRNGKey(1), np.uint32)

        rec = {}
        params = None
        for dt, cfg in [("float32", cfg32), ("bfloat16", cfgbf)]:
            steps = mod.make_steps(cfg)
            model, opt, train_step = steps[0], steps[1], steps[2]
            if params is None:  # same fp32 init for both dtypes
                params = mod.init_params(model, jax.random.PRNGKey(0), batch)
            ms = timeit(jax.jit(train_step), params, opt.init(params), batch,
                        key)
            rec[f"step_ms_{dt}"] = round(ms, 2)
        rec["speedup_x"] = round(rec["step_ms_float32"]
                                 / rec["step_ms_bfloat16"], 3)
        results["steps"][name] = rec
        print(json.dumps({"harness": name, **rec}), flush=True)

    # --- convergence: every harness from the same fp32 init, fp32 vs bf16 -
    # (round-4 verdict task 5: RPM and FMR get the same treatment DCP did)
    for name in args.models.split(","):
        conv = {}
        for dt in ["float32", "bfloat16"]:
            exp_dir = os.path.join(args.exp_root, f"{name}_{dt}")
            shutil.rmtree(exp_dir, ignore_errors=True)
            fit = H.FitConfig(epochs=args.conv_epochs, exp_dir=exp_dir,
                              seed=1234, save_every=0, artifacts_every=0,
                              log_tensorboard=False, resume=False)
            cfg, mod, extra = _harness(name, dt, args.backend, fit)
            train_loader, test_loader = DS.generate_datasets(
                DS.DatasetConfig(**extra, **mk))
            t0 = time.time()
            mod.train(cfg, train_loader, test_loader, log=lambda *a: None)
            losses = tag_series(exp_dir, "train/loss")
            evals = tag_series(exp_dir, "test/loss")
            rmse = tag_series(exp_dir, "test/loss_rot_euler_rmse")
            last5 = float(np.mean(losses[-5:]))
            conv[dt] = {
                "wall_s": round(time.time() - t0, 1),
                "train_loss_first": round(losses[0], 5),
                "train_loss_last5_mean": round(last5, 5),
                "test_loss_last": round(evals[-1], 5) if evals else None,
                "test_rot_rmse_last": round(rmse[-1], 4) if rmse else None,
                "train_loss_curve_every5": [round(x, 5) for x in losses[::5]],
            }
        f32, bf = conv["float32"], conv["bfloat16"]
        conv["final_train_rel_diff"] = round(
            abs(f32["train_loss_last5_mean"] - bf["train_loss_last5_mean"])
            / max(abs(f32["train_loss_last5_mean"]), 1e-9), 4)
        if (f32["test_loss_last"] is not None
                and bf["test_loss_last"] is not None):
            conv["final_test_rel_diff"] = round(
                abs(f32["test_loss_last"] - bf["test_loss_last"])
                / max(abs(f32["test_loss_last"]), 1e-9), 4)
        if (f32["test_rot_rmse_last"] is not None
                and bf["test_rot_rmse_last"] is not None):
            conv["rot_rmse_ratio_bf16_over_fp32"] = round(
                bf["test_rot_rmse_last"]
                / max(f32["test_rot_rmse_last"], 1e-9), 4)
        results["convergence"][name] = conv
        print(json.dumps({f"convergence_{name}": conv}), flush=True)

    results["wall_s_note"] = (
        "wall_s includes XLA compilation. Both dtypes share the persistent "
        "compile cache, so whichever (harness, dtype) pair first runs a "
        "given program shape on a cold cache pays the full compile wall — "
        "the round-4 artifact's 77.8 s bf16 vs 34.8 s fp32 asymmetry for "
        "identical 40-epoch DCP runs was exactly this (fp32 hit the "
        "driver's warm cache, bf16 compiled cold), not a bf16 slowdown. "
        "Compare steady-state step times under 'steps', not wall_s.")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
