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

    sample = jax.jit(lambda k: LN.sample_lines(k, r, center, C))
    cand = sample(key)
    hits = jax.jit(lambda c: (LN.triangle_hits(fvs1, c) > 0)
                   & (LN.triangle_hits(fvs2, c) > 0))
    ok = hits(cand)

    fill_a = jax.jit(lambda c, o: LN._fill_first_n(c, o, args.n_lines))
    fill_b = jax.jit(lambda c, o: LN._fill_first_n_gather(c, o, args.n_lines))
    la, lb = fill_a(cand, ok), fill_b(cand, ok)
    assert np.array_equal(np.asarray(la), np.asarray(lb)), "fill variants differ"

    full = jax.jit(lambda k: LN.resample_lines(k, r, center, args.n_lines,
                                               v1, v2))

    out = {
        "n_lines": args.n_lines,
        "candidates": C,
        "acceptance": float(np.mean(np.asarray(ok))),
        "ms_sample": timeit(sample, key),
        "ms_hits": timeit(hits, cand),
        "ms_fill_sort7": timeit(fill_a, cand, ok),
        "ms_fill_sort2_gather": timeit(fill_b, cand, ok),
        "ms_full_resample": timeit(full, key),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
