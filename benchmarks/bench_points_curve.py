#!/usr/bin/env python
"""Points-vs-throughput scaling curve + batched 2048-pt multi-pair mode.

Round-3 verdict task 7: tie the recorded endpoints together — the 2048-pt
single-pair headline (bench.py, ~346 it/s) and the 16,384-pt LARGE_N run
(~112 steps/s) — with a full curve at the headline's 20k-line budget, and
record the batched multi-pair mode AT the true-2048 configuration (it was
previously recorded only at 1024 pts).

- curve: F = num_sample in {1024, 2048, 4096, 8192, 16384}, B=1, 20k lines,
  full classical step (resample + metric fwd+grad + Adam) as a scanned
  device block (the production path, train/classical.py:run_block);
- batched: B in {4, 8} at 2048 pts (make_batch_step), pair-iterations/sec.

Writes benchmarks/SCALING_CURVE.json.

Usage: python benchmarks/bench_points_curve.py [--points 1024,...]
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

import numpy as np


def blob(n, seed=0):
    rng = np.random.default_rng(seed)
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1)
    p = (p * np.array([1.0, 0.7, 0.5])).astype(np.float32)
    return p + rng.standard_normal(p.shape).astype(np.float32) * 0.01


def time_block(step, carry, iters, seed=1):
    import jax

    @jax.jit
    def run_block(carry, keys):
        return jax.lax.scan(step, carry, keys)

    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * iters)
    carry, _ = run_block(carry, keys[:iters])     # same-shape warmup block
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    carry, metrics = run_block(carry, keys[iters:])
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    return iters / dt, {k: float(np.asarray(v)[-1].mean())
                        for k, v in jax.device_get(metrics).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="1024,2048,4096,8192,16384")
    ap.add_argument("--batches", default="4,8")
    ap.add_argument("--n_lines", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "SCALING_CURVE.json"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/arrl_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import optax

    from a_robust_registration_loss_tpu.train import classical

    results = {"n_lines": args.n_lines, "backend": jax.default_backend(),
               "curve": [], "batched_2048": []}

    for pts in [int(x) for x in args.points.split(",")]:
        cfg = classical.ClassicalConfig(
            n_lines=args.n_lines, num_sample=pts, line_chunk=None,
            compute_chamfer=False, backend="pallas")
        data = classical.prepare_pair(blob(max(pts, 1024)),
                                      blob(max(pts, 1024), seed=1), cfg)
        optimizer = optax.adam(classical.lr_schedule(cfg))
        params = classical.init_twist(jax.random.PRNGKey(0))
        carry = (params, optimizer.init(params), data["src"])
        step = classical.make_step(cfg, data, optimizer)
        iters = max(20, args.iters // max(1, pts // 4096))
        ips, metrics = time_block(step, carry, iters)
        rec = {"n_points": int(np.asarray(data["neis_src"]).shape[0]),
               "iters_per_sec": round(ips, 1),
               "ms_per_iter": round(1000 / ips, 3),
               "final_loss": metrics.get("loss")}
        results["curve"].append(rec)
        print(json.dumps(rec), flush=True)

    for B in [int(x) for x in args.batches.split(",")]:
        cfg = classical.ClassicalConfig(
            n_lines=args.n_lines, num_sample=2048, line_chunk=None,
            compute_chamfer=False, backend="pallas")
        src = np.stack([blob(2048, seed=10 + i) for i in range(B)])
        tar = np.stack([blob(2048, seed=20 + i) for i in range(B)])
        data = classical.prepare_pairs(src, tar, cfg)
        optimizer = optax.adam(classical.lr_schedule(cfg))
        params = np.stack(
            [np.asarray(classical.init_twist(jax.random.PRNGKey(i)))
             for i in range(B)])
        import jax.numpy as jnp

        params = jnp.asarray(params)
        carry = (params, optimizer.init(params), data["src"])
        step = classical.make_batch_step(cfg, data, optimizer)
        iters = max(20, args.iters // (2 * B // 4))
        ips, metrics = time_block(step, carry, iters)
        rec = {"batch": B, "n_points": 2048,
               "batch_iters_per_sec": round(ips, 1),
               "pair_iters_per_sec": round(ips * B, 1),
               "ms_per_batch_iter": round(1000 / ips, 3)}
        results["batched_2048"].append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
