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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dcp,rpm,fmr")
    ap.add_argument("--dcp_emb", default="dgcnn",
                    choices=["pointnet", "dgcnn"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_points", type=int, default=1024)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

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
                model=DCPConfig(emb_nn=args.dcp_emb),
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
                model=FMRConfig(num_points=args.n_points),
            )
            model, opt, step, _, _ = TF.make_steps(cfg)
            params = TF.init_params(model, jax.random.PRNGKey(0), batch)
            extra = {"maxiter": cfg.train_maxiter, "n_lines": 15000}
        else:
            raise SystemExit(f"unknown model {name}")

        opt_state = opt.init(params)
        jstep = jax.jit(step)
        ms = timeit(jstep, params, opt_state, batch, key)
        print(json.dumps({
            "harness": name, "ms_per_step": round(ms, 2),
            "batch": args.batch, "n_points": args.n_points,
            "backend": args.backend, **extra,
        }), flush=True)


if __name__ == "__main__":
    main()
