#!/usr/bin/env python
"""Multichip scaling benchmark: the batched metric fwd+grad on a (dp, sp)
mesh vs one device, reporting per-configuration throughput and efficiency.

On a single-chip host this still runs by forcing N virtual CPU devices
(--virtual N), which measures the *program* (collective layout, sharding
correctness) rather than real ICI speedups — pass nothing on a real pod.

Usage: python benchmarks/bench_scaling.py [--virtual 8] [--batch 8] ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real devices)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_points", type=int, default=512)
    ap.add_argument("--n_lines", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M
    from a_robust_registration_loss_tpu.parallel import mesh as pmesh

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    B, N, L = args.batch, args.n_points, args.n_lines
    i = np.arange(N) + 0.5
    phi = np.arccos(1 - 2 * i / N)
    th = np.pi * (1 + 5**0.5) * i
    base = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                     np.cos(phi)], -1).astype(np.float32)
    src = np.stack([base + rng.standard_normal(base.shape).astype(np.float32)
                    * 0.01 for _ in range(B)])
    tar = np.stack([base + rng.standard_normal(base.shape).astype(np.float32)
                    * 0.01 for _ in range(B)])
    n1 = jnp.stack([G.sample_neighs(jnp.asarray(s), N, 3).reshape(N, 9)
                    for s in src])
    n2 = jnp.stack([G.sample_neighs(jnp.asarray(t), N, 3).reshape(N, 9)
                    for t in tar])
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    lines = jax.vmap(
        lambda k, a, b: LN.resample_lines(k, jnp.float32(2.2),
                                          jnp.zeros(3, jnp.float32), L, a, b)
    )(keys, jnp.asarray(src), jnp.asarray(tar))

    def loss_fn(a, b, l):
        losses, valid = M.intersection_loss_batch(a, b, l, line_chunk=None)
        return jnp.where(valid, losses, 0.0).mean()

    fwd_bwd = jax.jit(jax.value_and_grad(loss_fn))

    def bench(a, b, l, mesh=None):
        ctx = mesh if mesh is not None else _null()
        with ctx:
            loss, g = fwd_bwd(a, b, l)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                loss, g = fwd_bwd(a, b, l)
            jax.block_until_ready(g)
        return (time.perf_counter() - t0) / args.iters, float(loss)

    class _null:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    results = []
    t1, loss1 = bench(n1, n2, lines)
    results.append({"devices": 1, "layout": "single", "sec_per_iter": t1,
                    "loss": loss1})

    configs = []
    if n_dev >= 2:
        configs.append((min(n_dev, B), 1))
    if n_dev >= 4:
        configs.append((n_dev // 2, 2))
    for dp, sp in configs:
        if B % dp:
            continue
        mesh = pmesh.make_mesh(dp=dp, sp=sp,
                               devices=jax.devices()[: dp * sp])
        a = jax.device_put(n1, pmesh.batch_sharding(mesh))
        b = jax.device_put(n2, pmesh.batch_sharding(mesh))
        l = jax.device_put(lines, pmesh.line_sharding(mesh))
        t, loss = bench(a, b, l, mesh)
        results.append({
            "devices": dp * sp, "layout": f"dp{dp}xsp{sp}",
            "sec_per_iter": t, "loss": loss,
            "speedup_vs_1": t1 / t,
        })

    print(json.dumps({
        "metric": "scaling_fwd_bwd", "unit": "sec/iter",
        "batch": B, "n_points": N, "n_lines": L,
        "platform": jax.devices()[0].platform, "n_devices": n_dev,
        "results": results,
    }))


if __name__ == "__main__":
    main()
