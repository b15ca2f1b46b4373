#!/usr/bin/env python
"""Torch-reference RPM-Net control run (round-2 verdict task 2b).

Trains the ACTUAL reference network + loss + update rule — RPMNetEarlyFusion
(rpm/models/rpmnet.py), cal_loss's per-iter/per-sample intersection metric +
outlier regularization + discounts (Train_RPM.py:184-280), the
``10 * loss_reg + 1.0 * loss_intersection`` update (:314-316), Adam lr=2e-3
(:434) with the OneCycleLR-constant-2e-5 quirk (:383-390), and the identity
pretraining phase (:349-378) — on the same generated views dataset and
train/test split as our JAX streams, then reports the held-out
rotation-euler RMSE exactly as our harness computes it.

Purpose: a cross-framework basin-sensitivity control for the RPM accuracy
spread recorded in benchmarks/VARIANCE_rpm.json. The full 1024-pt/10k-line
protocol is CPU-infeasible for torch in this environment (no CUDA; tens of
hours), so the control runs a REDUCED protocol — and the paired JAX streams
in rpm_variance_controls.py use the identical reduction, so the spread
comparison is like-for-like.

Usage:
  python benchmarks/rpm_torch_control.py --seed 1234 \
      --out benchmarks/_torch_control_1234.json
"""

import argparse
import json
import os
import sys
import time
import types

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np

REFERENCE = "/root/reference/code"
RPM_DIR = os.path.join(REFERENCE, "exps_deep_learning", "rpm")


def _install_stubs():
    def _getattr(attr):
        if attr.startswith("__"):  # keep inspect/import machinery honest
            raise AttributeError(attr)
        return type(attr, (), {})

    for name in ("igl", "openmesh", "cv2", "trimesh", "open3d", "h5py",
                 "plyfile"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                mod.__getattr__ = _getattr
                sys.modules[name] = mod


def _to_torch(torch, batch):
    return {k: torch.from_numpy(np.ascontiguousarray(v)).float()
            for k, v in batch.items()}


def reference_cal_loss(torch, loss_mod, se3_t, data, pred_transforms,
                       endpoints, n_lines, wt_inliers):
    """Transliteration of BaseRPMNet.cal_loss (Train_RPM.py:184-280),
    artifact dumps removed; every formula and ordering preserved."""
    num_iter = len(pred_transforms)
    tar_faces = data["points_based_neighs_tar"].reshape(
        data["points_tar_sample"].shape[0], -1, 9)
    R = torch.norm(data["tar_box"][:, 0, :] - data["tar_box"][:, -1, :],
                   dim=-1, p=2).reshape(-1, 1)
    losses_intersec = {}
    loss_reg = {}
    lines = None
    for ni in range(num_iter):
        pred_src = se3_t.transform(pred_transforms[ni],
                                   data["points_src_sample"][..., :3])
        pred_faces = se3_t.transform(
            pred_transforms[ni], data["points_based_neighs_src"]).reshape(
                pred_src.shape[0], -1, 9)
        acc = torch.zeros((), dtype=torch.float32)
        if lines is None:
            lines = loss_mod.Random_uniform_distribution_lines_batch_efficient_resample(
                R, data["centers"], n_lines, pred_src.detach(),
                data["points_tar_sample"], "cpu")
        for j in range(pred_faces.shape[0]):
            lj = loss_mod.cal_loss_intersection_batch_whole_median_pts_lines(
                1, 1, 5, 5, pred_faces[j:j + 1], tar_faces[j:j + 1],
                lines[j:j + 1], "cpu")
            if isinstance(lj, tuple):  # the (None,None,None) sentinel
                continue
            acc = acc + lj
        losses_intersec[ni] = acc / num_iter
    for ni in range(num_iter):
        perm = endpoints["perm_matrices"][ni]
        ref_out = (1.0 - torch.sum(perm, dim=1)) * wt_inliers
        src_out = (1.0 - torch.sum(perm, dim=2)) * wt_inliers
        loss_reg[ni] = torch.mean(ref_out) + torch.mean(src_out)
    total_inter = sum(0.5 ** (num_iter - ni - 1) * losses_intersec[ni]
                      for ni in losses_intersec)
    total_reg = sum(0.5 ** (num_iter - ni - 1) * loss_reg[ni]
                    for ni in loss_reg)
    return total_inter, total_reg


def euler_rmse_deg(R_pred, R_gt):
    """Per-batch rotation-euler RMSE, same convention as
    eval/metrics.rotation_euler_errors (xyz, degrees)."""
    from scipy.spatial.transform import Rotation

    e_p = Rotation.from_matrix(np.asarray(R_pred)).as_euler("xyz",
                                                            degrees=True)
    e_g = Rotation.from_matrix(np.asarray(R_gt)).as_euler("xyz", degrees=True)
    return float(np.sqrt(np.mean((e_p - e_g) ** 2)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=os.path.join(REPO, "datasets",
                                                       "human_views_512"))
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--n_views", type=int, default=10)
    ap.add_argument("--train_count", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_lines", type=int, default=2000)
    ap.add_argument("--pretrain_epochs", type=int, default=20)
    ap.add_argument("--feat_dim", type=int, default=96)
    ap.add_argument("--num_neighbors", type=int, default=64)
    ap.add_argument("--wt_inliers", type=float, default=1e-2)
    ap.add_argument("--train_reg_iter", type=int, default=2)
    ap.add_argument("--eval_reg_iter", type=int, default=5)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    _install_stubs()
    import torch

    torch.set_num_threads(args.threads)
    sys.path.insert(0, RPM_DIR)
    sys.path.insert(0, REFERENCE)
    import importlib

    loss_mod = importlib.import_module("loss")
    rpm_ref = importlib.import_module("models.rpmnet")
    se3_t = importlib.import_module("common.math_torch.se3")

    # dataset: same builder + loader + split as the JAX streams (the loader
    # yields numpy dicts honoring the reference's Dataset_2021_8_29 contract)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from benchmarks.train_convergence import ensure_dataset
    from a_robust_registration_loss_tpu.data import dataset as DS

    ensure_dataset(args.data_dir, n_views=args.n_views,
                   num_points=args.num_points)
    n_meshes = len({f.split("_")[2] for f in os.listdir(args.data_dir)
                    if f.startswith("src_sample_")})
    train_loader, test_loader = DS.generate_datasets(DS.DatasetConfig(
        data_path=args.data_dir, layout="views", n_meshes=n_meshes,
        n_views=args.n_views, train_batch=args.batch_size, seed=args.seed,
        train_count=args.train_count))

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    margs = types.SimpleNamespace(no_slack=False, num_sk_iter=5,
                                  features=["ppf", "dxyz", "xyz"],
                                  feat_dim=args.feat_dim, radius=0.3,
                                  num_neighbors=args.num_neighbors)
    net = rpm_ref.RPMNetEarlyFusion(margs)
    opt = torch.optim.Adam(net.parameters(), lr=2e-3)  # Train_RPM.py:434

    t0 = time.time()
    # identity pretraining at the raw lr=2e-3 (Train_RPM.py:349-378)
    for epoch in range(args.pretrain_epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            data = _to_torch(torch, batch)
            opt.zero_grad()
            pred, _ = net(data, 1)
            Rm, T = pred[0][..., :3, :3], pred[0][..., :3, 3]
            loss = torch.mean((Rm - torch.eye(3)) ** 2) + torch.mean(T ** 2)
            loss.backward()
            opt.step()
        print(f"pretrain {epoch}: {float(loss):.6f}", flush=True)

    # run(): OneCycleLR construction pins lr to 2e-5 and is never stepped
    torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=2e-5, steps_per_epoch=1,
                                        epochs=100000, div_factor=1,
                                        final_div_factor=1, pct_start=0.001)
    history = []
    for epoch in range(args.epochs):
        train_loader.set_epoch(args.pretrain_epochs + epoch)
        net.train()
        ep_losses = []
        for batch in train_loader:
            data = _to_torch(torch, batch)
            opt.zero_grad()
            pred, endpoints = net(data, args.train_reg_iter)
            inter, reg = reference_cal_loss(
                torch, loss_mod, se3_t, data, pred, endpoints,
                args.n_lines, args.wt_inliers)
            total = 10 * reg + 1.0 * inter  # Train_RPM.py:316
            total.backward()
            opt.step()
            ep_losses.append(float(total))
        history.append(float(np.mean(ep_losses)))
        print(f"epoch {epoch}: loss={history[-1]:.6f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval: final-iteration rotation vs GT, euler RMSE per batch,
    # averaged over test batches (the harness's aggregation)
    net.eval()
    rmses = []
    with torch.no_grad():
        for batch in test_loader:
            data = _to_torch(torch, batch)
            pred, _ = net(data, args.eval_reg_iter)
            R_pred = pred[-1][..., :3, :3].numpy()
            R_gt = np.swapaxes(np.asarray(batch["R"]), -1, -2)
            rmses.append(euler_rmse_deg(R_pred, R_gt))
    out = {
        "framework": "torch-reference",
        "seed": args.seed,
        "protocol": f"{args.num_points}pt views x{args.n_views}, "
                    f"{args.train_count} train, batch {args.batch_size}, "
                    f"{args.n_lines} lines, {args.epochs} epochs, "
                    f"pretrain {args.pretrain_epochs}@2e-3",
        "rot_rmse_deg": float(np.mean(rmses)),
        "per_pair_rmse": rmses,
        "final_train_loss": history[-1],
        "wall_seconds": time.time() - t0,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
