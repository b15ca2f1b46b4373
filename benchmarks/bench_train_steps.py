#!/usr/bin/env python
"""Unsupervised-training step-time benchmark for the model zoo.

Measures the full jitted train step (model fwd + intersection loss + backward
+ Adam) of each harness at the reference's training scale (B=4, 1024 pts,
DCP/FMR 15k lines, RPM 10k) on the default backend. The reference has no
comparable number — its per-batch cost at this scale is O(seconds) on GPU
(the per-sample Python loss loop alone does B full metric evaluations with
host-synced `.nonzero()` selections).

Usage: python benchmarks/bench_train_steps.py [--models dcp,rpm,fmr]
       [--dcp_emb pointnet|dgcnn] [--batch 4] [--n_points 1024]
Prints one JSON line per harness.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(B, N, seed=0):
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.ops import geometry as G

    i = np.arange(N) + 0.5
    phi = np.arccos(1 - 2 * i / N)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1).astype(np.float32)
    rng = np.random.default_rng(seed)
    srcs, tars, ns, nt, normals_s, normals_t = [], [], [], [], [], []
    for b in range(B):
        s = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
        t = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
        srcs.append(s)
        tars.append(t)
        ns.append(np.asarray(G.sample_neighs(jnp.asarray(s), N, 3)))
        nt.append(np.asarray(G.sample_neighs(jnp.asarray(t), N, 3)))
        normals_s.append(np.asarray(G.estimate_normals(jnp.asarray(s), k=10)))
        normals_t.append(np.asarray(G.estimate_normals(jnp.asarray(t), k=10)))
    batch = {
        "points_src_sample": jnp.asarray(np.stack(srcs)),
        "points_tar_sample": jnp.asarray(np.stack(tars)),
        "points_based_neighs_src": jnp.asarray(np.stack(ns)),
        "points_based_neighs_tar": jnp.asarray(np.stack(nt)),
        "normals_src": jnp.asarray(np.stack(normals_s)),
        "normals_tar": jnp.asarray(np.stack(normals_t)),
        "tar_box": jnp.asarray(np.stack(
            [np.concatenate([t.min(0, keepdims=True),
                             t.max(0, keepdims=True),
                             np.zeros((6, 3), np.float32)]) for t in tars])),
        "centers": jnp.zeros((B, 3)),
        "R": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).astype(jnp.float32),
        "T": jnp.zeros((B, 3)),
    }
    batch["igt"] = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).astype(jnp.float32)
    return batch


def timeit(f, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def decompose(name, cfg, model, params, batch, key, args):
    """Per-op decomposition of one training step (round-3 verdict task 3):
    time the independently-jitted pieces — model forward, line resampling,
    metric forward, full loss fwd+grad — so the step total is attributable.
    Pieces overlap (the full step recomputes the forward), so they are a
    breakdown of WORK, not a partition of the step wall."""
    import jax
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.train import losses as L

    out = {}
    radius_scale = 1.0 if name == "rpm" else 0.5

    if name == "dcp":
        fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b["points_src_sample"], b["points_tar_sample"]))
    elif name == "rpm":
        n_iter = cfg.num_train_reg_iter

        fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b["points_src_sample"], b["normals_src"],
            b["points_tar_sample"], b["normals_tar"], num_iter=n_iter))
        # the RPM feature pyramid alone (ball query + PPF + feat nets) —
        # the round-3 suspect (full (B,N,N) sort, now a top_k selection)
        from a_robust_registration_loss_tpu.models import rpmnet as RM

        grp = jax.jit(lambda b: RM.sample_and_group_multi(
            cfg.model.radius, cfg.model.num_neighbors,
            b["points_src_sample"], b["normals_src"]))
        out["rpm_group_fwd_ms"] = round(timeit(grp, batch), 2)
    else:
        maxiter = cfg.train_maxiter

        fwd = jax.jit(lambda p, b: model.apply(
            {"params": p}, b["points_tar_sample"], b["points_src_sample"],
            maxiter=maxiter)["g_series"])
    out["model_fwd_ms"] = round(timeit(fwd, params, batch), 2)

    lines_fn = jax.jit(lambda k, b: L.batch_lines(
        k, b["tar_box"], b["centers"], cfg.loss.n_lines,
        b["points_src_sample"], b["points_tar_sample"],
        radius_scale=radius_scale, backend=cfg.loss.backend))
    out["lines_ms"] = round(timeit(lines_fn, key, batch), 2)
    lines = lines_fn(key, batch)

    B = batch["points_src_sample"].shape[0]
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    t = jnp.full((B, 3), 0.01, jnp.float32)
    n1 = batch["points_based_neighs_src"].reshape(B, -1, 9)
    n2 = batch["points_based_neighs_tar"].reshape(B, -1, 9)
    metric_fwd = jax.jit(lambda R, t, a, b, l: L._metric_batch_rt(
        R, t, a, b, l, cfg.loss).sum())
    out["metric_fwd_ms"] = round(timeit(metric_fwd, R, t, n1, n2, lines), 2)
    metric_grad = jax.jit(lambda R, t, a, b, l: jax.value_and_grad(
        lambda tt: L._metric_batch_rt(R, tt, a, b, l, cfg.loss).sum())(t))
    out["metric_fwdbwd_ms"] = round(
        timeit(metric_grad, R, t, n1, n2, lines), 2)
    n_metric = {"dcp": 1, "rpm": cfg.num_train_reg_iter if name == "rpm"
                else 1, "fmr": 3}[name]
    out["metric_calls_per_step"] = n_metric
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcp,rpm,fmr")
    ap.add_argument("--dcp_emb", default="dgcnn",
                    choices=["pointnet", "dgcnn"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_points", type=int, default=1024)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (bfloat16 = mixed precision)")
    ap.add_argument("--decompose", action="store_true",
                    help="also time the step's pieces (model fwd, line "
                         "resample, metric fwd / fwd+bwd) independently "
                         "and write TRAIN_STEP_DECOMP.json")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "TRAIN_STEP_DECOMP.json"))
    args = ap.parse_args()
    all_decomp = {}

    import jax

    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")

    from a_robust_registration_loss_tpu.train import losses as L

    batch = make_batch(args.batch, args.n_points)
    key = jax.random.PRNGKey(1)

    for name in args.models.split(","):
        if name == "dcp":
            from a_robust_registration_loss_tpu.models.dcp import DCPConfig
            from a_robust_registration_loss_tpu.train import dcp as TD

            cfg = TD.DCPTrainConfig(
                loss=L.LossConfig(n_lines=15000, backend=args.backend,
                                  line_chunk=None),
                model=DCPConfig(emb_nn=args.dcp_emb, dtype=args.dtype),
            )
            model, opt, step, _, _, _ = TD.make_steps(cfg)
            params = TD.init_params(model, jax.random.PRNGKey(0), batch)
            extra = {"emb_nn": args.dcp_emb, "n_lines": 15000}
        elif name == "rpm":
            from a_robust_registration_loss_tpu.models.rpmnet import (
                RPMNetConfig,
            )
            from a_robust_registration_loss_tpu.train import rpmnet as TR

            cfg = TR.RPMTrainConfig(
                loss=L.LossConfig(n_lines=10000, backend=args.backend,
                                  line_chunk=None),
                model=RPMNetConfig(dtype=args.dtype),
            )
            model, opt, step, _, _, _ = TR.make_steps(cfg)
            params = TR.init_params(model, jax.random.PRNGKey(0), batch)
            extra = {"reg_iters": cfg.num_train_reg_iter, "n_lines": 10000}
        elif name == "fmr":
            from a_robust_registration_loss_tpu.models.fmr import FMRConfig
            from a_robust_registration_loss_tpu.train import fmr as TF

            cfg = TF.FMRTrainConfig(
                loss=L.LossConfig(n_lines=15000, backend=args.backend,
                                  line_chunk=None),
                model=FMRConfig(num_points=args.n_points,
                                dtype=args.dtype),
            )
            model, opt, step, _, _ = TF.make_steps(cfg)
            params = TF.init_params(model, jax.random.PRNGKey(0), batch)
            extra = {"maxiter": cfg.train_maxiter, "n_lines": 15000}
        else:
            raise SystemExit(f"unknown model {name}")

        opt_state = opt.init(params)
        jstep = jax.jit(step)
        ms = timeit(jstep, params, opt_state, batch, key)
        rec = {
            "harness": name, "ms_per_step": round(ms, 2),
            "batch": args.batch, "n_points": args.n_points,
            "backend": args.backend, "dtype": args.dtype, **extra,
        }
        if args.decompose:
            rec["decomposition"] = decompose(name, cfg, model, params, batch,
                                             key, args)
            all_decomp[name] = rec
        print(json.dumps(rec), flush=True)

    if args.decompose:
        with open(args.out, "w") as f:
            json.dump(all_decomp, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
