"""Component microbench of the line resampler (the largest step component
per the round-1 ledger: ~1.6 ms of the 4.1 ms classical step at 200k
candidates). Times, on the current backend:

- sample_lines (200k candidate draw)
- triangle_hits x2 (the 12-triangle bbox rejection test per cloud)
- the two fill implementations (7-operand sort vs 2-operand sort + gather)
- full resample_lines
- [--pallas] the fused pallas hit kernel when present

Usage: python benchmarks/bench_resampler.py [--n_lines 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np


def timeit(f, *args, n=30, warmup=5):
    import jax

    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_lines", type=int, default=20000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.ops import lines as LN

    base = "/root/reference/code/sample_data/challenge_data"
    v1, _ = objio.read_obj(os.path.join(base, "0_src_sample.obj"))
    v2, _ = objio.read_obj(os.path.join(base, "0_tar_sample.obj"))
    v1 = jnp.asarray(v1 - v1.mean(0))
    v2 = jnp.asarray(v2 - v2.mean(0))
    bbox = G.bounding_box_corners(v2[None])[0]
    r = jnp.linalg.norm(bbox[0] - bbox[-1])
    center = v2.mean(0)
    C = args.rounds * args.n_lines
    key = jax.random.PRNGKey(0)

    fvs1 = G.bbox_face_vertices(v1[None])[0]
    fvs2 = G.bbox_face_vertices(v2[None])[0]

    # every device array is an ARG (not a closure constant): compiling a jit
    # with a closure-captured concrete device array permanently serializes
    # async dispatch on the axon plugin (~1 ms/dispatch) and inflated every
    # number this bench recorded in round 1 (see benchmarks/RESULTS.md)
    sample = jax.jit(lambda k, rr, cc: LN.sample_lines(k, rr, cc, C))
    cand = sample(key, r, center)
    hits = jax.jit(lambda f1, f2, c: (LN.triangle_hits(f1, c) > 0)
                   & (LN.triangle_hits(f2, c) > 0))
    ok = hits(fvs1, fvs2, cand)

    fill_a = jax.jit(lambda c, o: LN._fill_first_n(c, o, args.n_lines))
    fill_b = jax.jit(lambda c, o: LN._fill_first_n_gather(c, o, args.n_lines))
    la, lb = fill_a(cand, ok), fill_b(cand, ok)
    assert np.array_equal(np.asarray(la), np.asarray(lb)), "fill variants differ"

    full = jax.jit(lambda k, rr, cc, a, b: LN.resample_lines(
        k, rr, cc, args.n_lines, a, b))

    # DEVICE time via one scanned dispatch per entry (benchmarks/_timing.py)
    # — per-dispatch wall timing over the axon tunnel reads ~1 ms of host
    # RTT for everything once any fetch has happened in the process
    from _timing import device_ms

    out = {
        "n_lines": args.n_lines,
        "candidates": C,
        "acceptance": float(np.mean(np.asarray(ok))),
        "ms_sample": device_ms(
            lambda k, rr, cc: LN.sample_lines(k, rr, cc, C), key, r, center),
        "ms_hits": device_ms(
            lambda f1, f2, c: (LN.triangle_hits(f1, c) > 0)
            & (LN.triangle_hits(f2, c) > 0), fvs1, fvs2, cand),
        "ms_fill_sort7": device_ms(
            lambda c, o: LN._fill_first_n(c, o, args.n_lines), cand, ok),
        "ms_fill_sort2_gather": device_ms(
            lambda c, o: LN._fill_first_n_gather(c, o, args.n_lines),
            cand, ok),
        "ms_full_resample": device_ms(
            lambda k, rr, cc, a, b: LN.resample_lines(
                k, rr, cc, args.n_lines, a, b), key, r, center, v1, v2),
        "ms_full_resample_pallas": (device_ms(
            lambda k, rr, cc, a, b: LN.resample_lines(
                k, rr, cc, args.n_lines, a, b, backend="pallas"),
            key, r, center, v1, v2)
            if jax.default_backend() not in ("cpu",) else None),
        "ms_full_resample_wall_per_dispatch": timeit(full, key, r, center,
                                                     v1, v2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
