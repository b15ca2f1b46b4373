#!/usr/bin/env python
"""The reference's Computation_cost table, reproduced on one TPU chip.

The reference publishes (data/Computation_cost.png) per-evaluation costs of
line sampling ("Sam") and the intersection loss ("Inter") over a
points x lines grid up to 10k points. This benchmark measures the same two
quantities — the 10-round rejection resampler, and the full metric — at the
same grid points plus a 16k+ row (BASELINE config 5: large-N tiled kernels),
fwd-only like the reference AND fwd+grad (which the reference never timed).

Usage: python benchmarks/bench_metric_table.py [--json out.json]
Prints one markdown table + one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# reference numbers (ms) from data/Computation_cost.png: {(pts, lines): (Sam, Inter)}
REFERENCE = {
    (1024, 5000): (36.6, 50.4),
    (1024, 20000): (46.4, 204.4),
    (5000, 5000): (42.3, 145.5),
    (5000, 20000): (45.6, 236.2),
    (10000, 5000): (45.6, 191.9),
    (10000, 20000): (47.4, 544.4),
    (16384, 20000): (None, None),  # beyond the reference's table
}


def _cloud(n, seed, noise=0.01):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1).astype(np.float32)
    rng = np.random.default_rng(seed)
    return p + rng.standard_normal(p.shape).astype(np.float32) * noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M
    from a_robust_registration_loss_tpu.se3 import se3

    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")

    rows = []
    print("| pts | lines | Sam ref (ms) | Sam ours | Inter ref (ms) | "
          "Inter ours (fwd) | Inter ours (fwd+grad) | speedup (Inter fwd) |")
    print("|---|---|---|---|---|---|---|---|")
    for (n_pts, n_lines), (ref_sam, ref_inter) in REFERENCE.items():
        src = jnp.asarray(_cloud(n_pts, 0))
        tar = jnp.asarray(_cloud(n_pts, 1))
        neis1 = G.sample_neighs(src, n_pts, 3).reshape(n_pts, 9)
        neis2 = G.sample_neighs(tar, n_pts, 3).reshape(n_pts, 9)
        center = tar.mean(0)
        bbox = G.bounding_box_corners(tar[None])[0]
        radius = jnp.linalg.norm(bbox[0] - bbox[-1])

        # DEVICE time via one scanned dispatch per entry (_timing.device_ms):
        # per-dispatch wall over the axon tunnel conflates device time with
        # a ~1 ms serialized-dispatch RTT once anything has been fetched in
        # the process, which inflated every round-1/2 number in this table
        # (benchmarks/RESULTS.md "Axon dispatch-pipelining poison")
        from _timing import device_ms

        key = jax.random.PRNGKey(0)
        t_sam = device_ms(
            lambda k, rr, cc, s, t: LN.resample_lines(
                k, rr, cc, n_lines, s, t, backend=args.backend),
            key, radius, center, src, tar)
        lines = LN.resample_lines(key, radius, center, n_lines, src, tar,
                                  backend=args.backend)

        t_fwd = device_ms(
            lambda a, b, l: M.intersection_loss(
                a, b, l, backend=args.backend)[0], neis1, neis2, lines)

        twist = jnp.asarray([0.03, -0.02, 0.04, 0.01, 0.0, -0.02])

        def loss_of(p, a, b, l):
            R, t = se3.exp3(p)
            return M.intersection_loss_rigid(R, t, a, b, l,
                                             backend=args.backend)[0]

        t_grad = device_ms(jax.value_and_grad(loss_of),
                           twist, neis1, neis2, lines)

        speedup = (ref_inter / t_fwd) if ref_inter else None
        rows.append({"pts": n_pts, "lines": n_lines,
                     "sam_ref_ms": ref_sam, "sam_ms": round(t_sam, 3),
                     "inter_ref_ms": ref_inter,
                     "inter_fwd_ms": round(t_fwd, 3),
                     "inter_fwdgrad_ms": round(t_grad, 3),
                     "speedup_fwd": round(speedup, 1) if speedup else None})
        print(f"| {n_pts} | {n_lines} | {ref_sam or '—'} | {t_sam:.2f} | "
              f"{ref_inter or '—'} | {t_fwd:.2f} | {t_grad:.2f} | "
              f"{f'{speedup:.1f}x' if speedup else '—'} |", flush=True)

    out = {"backend": args.backend, "rows": rows}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
