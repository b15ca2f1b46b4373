#!/usr/bin/env python
"""Loss microbenchmark — BASELINE config 2: batched intersection metric
forward + gradient at batch 32 x 1024 points, reporting iters/sec and
point-pairs/sec (SURVEY.md §7.6).

Reference comparison: the reference's metric evaluation at 1024 pts / 5000
lines costs 50.4 ms Inter + 36.6 ms Sam per SAMPLE on the authors' GPU
(BASELINE.md) — i.e. a 32-sample fwd-only batch is ~2.8 s there; this
measures our whole fwd+grad batch, jitted, on one chip.

Usage: python benchmarks/bench_loss.py [--batch 32] [--n_points 1024]
           [--n_lines 5000] [--backend pallas|xla] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_points", type=int, default=1024)
    ap.add_argument("--n_neis", type=int, default=1024)
    ap.add_argument("--n_lines", type=int, default=5000)
    ap.add_argument("--backend", default=None, help="pallas on tpu, else xla")
    ap.add_argument("--line_chunk", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M

    platform = jax.devices()[0].platform
    backend = args.backend or ("pallas" if platform not in ("cpu",) else "xla")

    rng = np.random.default_rng(0)
    B, N, F, L = args.batch, args.n_points, args.n_neis, args.n_lines
    i = np.arange(N) + 0.5
    phi = np.arccos(1 - 2 * i / N)
    th = np.pi * (1 + 5**0.5) * i
    base = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                     np.cos(phi)], -1).astype(np.float32)

    def neis(pts):
        return G.sample_neighs(jnp.asarray(pts), F, 3).reshape(F, 9)

    src = np.stack([base + rng.standard_normal(base.shape).astype(np.float32)
                    * 0.01 for _ in range(B)])
    tar = np.stack([base + rng.standard_normal(base.shape).astype(np.float32)
                    * 0.01 for _ in range(B)])
    n1 = jnp.stack([neis(s) for s in src])
    n2 = jnp.stack([neis(t) for t in tar])
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    lines = jax.vmap(
        lambda k, a, b: LN.resample_lines(k, jnp.float32(2.2),
                                          jnp.zeros(3, jnp.float32), L, a, b)
    )(keys, jnp.asarray(src), jnp.asarray(tar))

    lc = None if args.line_chunk <= 0 else args.line_chunk

    # n2/lines as ARGS (closure-captured device arrays serialize axon
    # dispatch process-wide; see benchmarks/RESULTS.md)
    def loss_fn(n1, n2, lines):
        losses, valid = M.intersection_loss_batch(
            n1, n2, lines, line_chunk=lc, backend=backend)
        return jnp.where(valid, losses, 0.0).mean()

    fwd_bwd = jax.jit(jax.value_and_grad(loss_fn))
    loss, g = fwd_bwd(n1, n2, lines)
    jax.block_until_ready(g)
    assert np.isfinite(float(loss)), f"loss not finite: {loss}"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss, g = fwd_bwd(n1, n2, lines)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / args.iters

    iters_per_sec = 1.0 / dt
    # a "point pair" = one (line, neighborhood) candidate on each cloud
    pairs = B * L * F * 2
    # reference Inter cost per sample at 1024 pts (BASELINE.md table)
    ref_table = {5000: 50.4, 20000: 204.4}
    ref_ms_per_sample = ref_table.get(L, 50.4 * L / 5000.0)
    ref_batch_sec = ref_ms_per_sample * B / 1000.0
    print(json.dumps({
        "metric": "loss_microbench_fwd_bwd",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": round(ref_batch_sec / dt, 2),
        "ms_per_iter": round(dt * 1000, 3),
        "point_pairs_per_sec": float(f"{pairs / dt:.3e}"),
        "batch": B, "n_points": N, "n_lines": L,
        "backend": backend, "platform": platform,
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
