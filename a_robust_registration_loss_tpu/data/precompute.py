"""Offline neighbor precompute: the runnable equivalent of the reference's
data_processing.py template (which has a syntax error at line 12 and calls a
nonexistent ``igl.write_triangle`` — SURVEY.md quirks ledger: fix).

For every ``*_sample.obj`` cloud this computes the FPS + 3-NN neighborhood
buffer on device (ops.geometry.sample_neighs — the reference round-trips
through a CPU sklearn KDTree, loss.py:473-485) and writes:
- ``{stem}_neigh.bin``: float32 (num_sample * num_neigh, 3) — the buffer the
  dataset contract reads (pre_dataloader.py:100-105);
- optionally ``{stem}_neigh.obj`` (the reference template's artifact).

Usage:
    python -m a_robust_registration_loss_tpu.data.precompute \
        --data_path DIR [--num_sample 5000] [--num_neigh 3] [--write_obj]
"""

from __future__ import annotations

import argparse
import glob
import os


def precompute_neighbors(obj_path: str, num_sample: int = 5000,
                         num_neigh: int = 3, write_obj: bool = False) -> str:
    import jax.numpy as jnp
    import numpy as np

    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.ops import geometry as G

    v, _ = objio.read_obj(obj_path)
    neighs = np.asarray(
        G.sample_neighs(jnp.asarray(v), min(num_sample, v.shape[0]), num_neigh)
    ).astype(np.float32)
    out_bin = obj_path.replace(".obj", "_neigh.bin")
    neighs.tofile(out_bin)
    if write_obj:
        objio.write_obj(obj_path.replace(".obj", "_neigh.obj"), neighs)
    return out_bin


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--pattern", default="*_sample.obj",
                    help="glob for sample clouds (excludes *_normals.obj)")
    ap.add_argument("--num_sample", type=int, default=5000)
    ap.add_argument("--num_neigh", type=int, default=3)
    ap.add_argument("--write_obj", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. cpu) — the axon TPU "
                         "plugin ignores the JAX_PLATFORMS env var, and "
                         "fixture-scale precomputes compile faster on CPU "
                         "than over the TPU tunnel")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    paths = sorted(glob.glob(os.path.join(args.data_path, args.pattern)))
    paths = [p for p in paths if "normals" not in os.path.basename(p)
             and "_neigh" not in os.path.basename(p)]
    if not paths:
        raise SystemExit(f"no clouds matching {args.pattern} in {args.data_path}")
    for p in paths:
        out = p.replace(".obj", "_neigh.bin")
        if os.path.exists(out) and not args.overwrite:
            print(f"skip (exists): {out}")
            continue
        out = precompute_neighbors(p, args.num_sample, args.num_neigh,
                                   args.write_obj)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
