#!/usr/bin/env python
"""One-shot registration of two point-cloud files — the production-serving
entry around the classical optimizer.

Unlike demo.py (which mirrors the reference demo's {label}_src_sample.obj
naming and artifact cadence, test_demo_optimized_Lie_Algebra.py:103-162),
this takes ANY two .obj/.ply files and emits the final transform:

    arrl-register src.obj tar.obj --out transform.txt [--pred_out reg.obj]

Output convention matches the reference's dumped 3x4 txt
(test_demo...py:88-96): rows [R | t] such that, in the MEAN-CENTERED
frames, ``src_centered @ R + t ~= tar_centered``. With --uncentered the
transform is re-expressed for the RAW input frames instead.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _read_cloud(path):
    from a_robust_registration_loss_tpu.data import objio, plyio

    if path.lower().endswith(".ply"):
        v, _ = plyio.read_ply(path)
        return np.asarray(v, np.float32)
    v, _ = objio.read_obj(path)
    return np.asarray(v, np.float32)


def main(argv=None):
    from a_robust_registration_loss_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help=".obj or .ply source cloud")
    ap.add_argument("tar", help=".obj or .ply target cloud")
    ap.add_argument("--out", default="transform.txt",
                    help="3x4 [R|t] text output")
    ap.add_argument("--pred_out", default=None,
                    help="optional .obj of the registered (transformed) "
                         "source cloud, in the raw target frame")
    ap.add_argument("--n_epochs", type=int, default=1000)
    ap.add_argument("--n_lines", type=int, default=20000)
    ap.add_argument("--num_sample", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--uncentered", action="store_true",
                    help="express [R|t] in the RAW input frames instead of "
                         "the reference's mean-centered frames")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")

    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.train import classical

    src = _read_cloud(args.src)
    tar = _read_cloud(args.tar)
    cfg = classical.ClassicalConfig(
        n_epochs=args.n_epochs, n_lines=args.n_lines,
        num_sample=args.num_sample, seed=args.seed, backend=args.backend,
        line_chunk=None, log_every=max(args.n_epochs // 5, 1))

    t0 = time.perf_counter()
    params, hist = classical.run(src, tar, cfg)
    dt = time.perf_counter() - t0
    R, t, transform = classical.final_transform(params)

    c_src = src.mean(0)
    c_tar = tar.mean(0)
    if args.uncentered:
        # raw frames: y = (x - c_src) @ R + t + c_tar
        t_raw = t - c_src @ R + c_tar
        transform = np.ones((3, 4), np.float64)
        transform[:3, :3] = R
        transform[:3, 3] = t_raw
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savetxt(args.out, transform)
    if args.pred_out:
        pred = (src - c_src) @ R + t + c_tar
        objio.write_obj(args.pred_out, pred.astype(np.float32))
    print(f"registered {args.src} -> {args.tar}: final metric "
          f"{float(hist['loss'][-1]):.6f}, chamfer "
          f"{float(hist['chamfer'][-1]):.6f}, {args.n_epochs} epochs in "
          f"{dt:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
