#!/usr/bin/env python
"""Accuracy-parity artifact: the PyTorch reference demo vs our JAX demo on
the committed sample data (BASELINE target: "rot/trans RMSE parity").

Runs BOTH implementations end-to-end on the same source/target pair —
the actual reference modules (code/loss.py, LieAlgebra) driving the
reference's test_one_case loop (test_demo_optimized_Lie_Algebra.py:27-100)
on CPU, and our train/classical.py — then reports the final rotation
difference (geodesic degrees), translation difference, and both final
chamfer distances. RNG streams necessarily differ across frameworks
(SURVEY.md §7 hard parts), so parity is judged on the CONVERGED TRANSFORMS,
not on per-step values (those are golden-tested elsewhere on identical
inputs, tests/test_metric.py).

Usage:
    python benchmarks/parity_demo.py --data_path .../sample_data/airplane_data \
        --labels 0 1 --n_epochs 500 --n_lines 2000 [--out PARITY.json]
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/code"
sys.path.insert(0, REPO)

import numpy as np


def _import_reference():
    for name in ("igl", "openmesh", "cv2", "trimesh", "open3d"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    loss = importlib.import_module("loss")
    lie = importlib.import_module("LieAlgebra")
    return loss, lie.se3


def run_torch(src, tar, n_epochs, n_lines, num_sample, seed, log=print):
    """The reference's test_one_case loop, faithfully, on CPU (the demo
    supports device='cpu'; igl calls replaced by equivalent numpy)."""
    import torch

    loss_mod, _ = _import_reference()
    torch.manual_seed(seed)
    np.random.seed(seed)
    device = "cpu"

    neighs1 = loss_mod.Sample_neighs(src, num_sample=num_sample, device=device)
    neighs2 = loss_mod.Sample_neighs(tar, num_sample=num_sample, device=device)
    c1, c2 = src.mean(0, keepdims=True), tar.mean(0, keepdims=True)
    v1, v2 = src - c1, tar - c2
    neighs1, neighs2 = neighs1 - c1, neighs2 - c2
    v1_t = torch.from_numpy(v1.astype(np.float32))
    v2_t = torch.from_numpy(v2.astype(np.float32))
    f1_t = torch.from_numpy(neighs1.astype(np.float32)).reshape(1, -1, 3)
    f2_t = torch.from_numpy(neighs2.astype(np.float32))
    # igl.bounding_box replacement: the demo only uses ||bb[0] - bb[-1]||,
    # i.e. the full AABB diagonal
    R = float(np.linalg.norm(v2.max(0) - v2.min(0)))
    centers = v2_t.mean(0)

    recon = loss_mod.Reconstruction_point().to(device)
    optimize = torch.optim.Adam(recon.parameters(), lr=2e-2)
    vertics1 = v1_t
    t0 = time.perf_counter()
    for epoch in range(n_epochs):
        lines = loss_mod.Random_uniform_distribution_lines_batch_efficient_resample(
            torch.FloatTensor([R]).reshape(1, 1), centers.reshape(1, -1),
            n_lines, vertics1.view(1, -1, 3), v2_t.view(1, -1, 3), device,
        ).detach().view(-1, 6)
        # adjust_learning_rate halves at every epoch % 1000 == 0 incl. 0
        if epoch % 1000 == 0:
            for pg in optimize.param_groups:
                pg["lr"] = pg["lr"] * 0.5
        vertics1, faces1 = recon(v1_t, f1_t)
        loss_di = loss_mod.cal_loss_intersection_batch_whole_median_pts_lines(
            1, 1, 5, 5, faces1.reshape(1, -1, 9),
            f2_t.reshape(1, -1, 9), lines.reshape(1, -1, 6), device)
        if loss_di is not None and not isinstance(loss_di, tuple):
            optimize.zero_grad()
            loss_di.backward()
            optimize.step()
        if epoch % 100 == 0:
            cf = loss_mod.chamfer_dist(
                vertics1.reshape(1, -1, 3).detach(), v2_t.reshape(1, -1, 3))
            log(f"  torch epoch {epoch}: chamfer={float(cf):.6f}")
    with torch.no_grad():
        vertics1, _ = recon(v1_t, f1_t)
        chamfer = float(loss_mod.chamfer_dist(
            vertics1.reshape(1, -1, 3), v2_t.reshape(1, -1, 3)))
        Rm, tm = recon.Transform()
    return (np.asarray(Rm[0].detach()), np.asarray(tm.detach()).reshape(3),
            chamfer, time.perf_counter() - t0)


def run_jax(src, tar, n_epochs, n_lines, num_sample, seed, log=print):
    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.train import classical

    cfg = classical.ClassicalConfig(
        n_epochs=n_epochs, n_lines=n_lines, num_sample=num_sample,
        seed=seed, log_every=100, line_chunk=None, compute_chamfer=True)
    t0 = time.perf_counter()
    params, hist = classical.run(
        src, tar, cfg,
        callback=lambda e, p, m, s: log(
            f"  jax epoch {e}: chamfer={m['chamfer']:.6f}"))
    R, t, _ = classical.final_transform(params)
    return R, t, float(hist["chamfer"][-1]), time.perf_counter() - t0


def rotation_angle_deg(Ra, Rb):
    ctheta = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(ctheta, -1.0, 1.0))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--labels", nargs="+", default=["0"])
    ap.add_argument("--n_epochs", type=int, default=500)
    ap.add_argument("--n_lines", type=int, default=2000)
    ap.add_argument("--num_sample", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. cpu) — the axon TPU "
                         "plugin ignores the JAX_PLATFORMS env var")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from a_robust_registration_loss_tpu.data import objio

    results = []
    for label in args.labels:
        src, _ = objio.read_obj(
            os.path.join(args.data_path, f"{label}_src_sample.obj"))
        tar, _ = objio.read_obj(
            os.path.join(args.data_path, f"{label}_tar_sample.obj"))
        print(f"[label {label}] src {src.shape} tar {tar.shape}")
        Rj, tj, cj, tjx = run_jax(src, tar, args.n_epochs, args.n_lines,
                                  args.num_sample, args.seed)
        print(f"  jax   final chamfer {cj:.6f} ({tjx:.0f}s)")
        rec = {"label": label, "jax_chamfer": cj, "jax_seconds": tjx,
               "jax_R": Rj.tolist(), "jax_t": tj.tolist()}
        if not args.skip_torch:
            Rt, tt, ct, ttx = run_torch(src, tar, args.n_epochs, args.n_lines,
                                        args.num_sample, args.seed)
            print(f"  torch final chamfer {ct:.6f} ({ttx:.0f}s)")
            rec.update(
                torch_chamfer=ct, torch_seconds=ttx,
                torch_R=Rt.tolist(), torch_t=tt.tolist(),
                rot_diff_deg=rotation_angle_deg(Rt, Rj),
                trans_diff=float(np.linalg.norm(tt - tj)),
            )
            print(f"  parity: rot diff {rec['rot_diff_deg']:.3f} deg, "
                  f"trans diff {rec['trans_diff']:.4f}, "
                  f"chamfer jax {cj:.6f} vs torch {ct:.6f}")
        results.append(rec)

    out = args.out or os.path.join(REPO, "benchmarks", "PARITY.json")
    payload = {
        "config": {k: getattr(args, k) for k in
                   ("data_path", "n_epochs", "n_lines", "num_sample", "seed")},
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
