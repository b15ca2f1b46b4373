"""Registration accuracy metrics — the reference's monitoring oracles.

TPU-native (jittable, closed-form) equivalents of:
- ``npmat2euler`` (reference: utils.py:70-75) — scipy Rotation round-trip,
  replaced by closed-form extrinsic-Euler extraction (SURVEY.md §2.6 third-
  party replacement table).
- rotation Euler MAE/RMSE, rotation/translation MSE, point-pair-wise
  RMSE/MAE (reference: dcp/Train_DCP.py:272-300).
- FMR's ``dm = ||se3.log(g_hat @ igt)||`` twist-error metric
  (reference: fmr/model.py:799-805).

Everything accepts batched arrays and works under jit; euler angles are in
DEGREES like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.se3 import se3


def mat2euler(mats, seq: str = "zyx", degrees: bool = True):
    """Rotation matrices -> extrinsic Euler angles, matching
    scipy.spatial.transform.Rotation.as_euler(seq) for seq in {'xyz', 'zyx'}
    (the only sequences the reference uses: utils.py:70-75 default 'zyx',
    dcp/Train_DCP.py:291 'xyz').

    mats: (..., 3, 3) -> (..., 3) angles in the sequence's axis order.
    """
    R = mats
    if seq == "xyz":
        # R = Rz(c) @ Ry(b) @ Rx(a); returns [a, b, c]
        a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
        b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
        c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
        ang = jnp.stack([a, b, c], axis=-1)
    elif seq == "zyx":
        # R = Rx(c) @ Ry(b) @ Rz(a); returns [a, b, c]
        a = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
        b = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
        c = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
        ang = jnp.stack([a, b, c], axis=-1)
    else:
        raise ValueError(f"unsupported euler sequence: {seq!r}")
    if degrees:
        ang = ang * (180.0 / jnp.pi)
    return ang


def rotation_euler_errors(R_pred, R_gt, seq: str = "xyz"):
    """(MAE, RMSE) of Euler angles in degrees — the reference's
    loss_rotation_euler_{mae,rmse} (dcp/Train_DCP.py:290-296).

    R_pred, R_gt: (..., 3, 3).
    """
    e_pred = mat2euler(R_pred, seq)
    e_gt = mat2euler(R_gt, seq)
    diff = e_pred - e_gt
    mae = jnp.mean(jnp.abs(diff))
    rmse = jnp.sqrt(jnp.mean(diff**2))
    return mae, rmse


def rotation_mse(R_pred, R_gt):
    """F.mse_loss of rotation matrices (dcp/Train_DCP.py:272)."""
    return jnp.mean((R_pred - R_gt) ** 2)


def translation_mse(t_pred, t_gt):
    """F.mse_loss of translations (dcp/Train_DCP.py:273)."""
    return jnp.mean((t_pred - t_gt) ** 2)


def pp_wise_rmse(pred_pts, gt_pts):
    """Point-pair-wise RMSE sqrt(mean((pred - gt)^2))
    (the reference's loss_pp_wise, dcp/Train_DCP.py:277-279)."""
    return jnp.sqrt(jnp.mean((pred_pts - gt_pts) ** 2))


def pp_wise_mae(pred_pts, gt_pts):
    """Point-pair-wise MAE mean(|pred - gt|)
    (the reference's loss_pp_wise_mae, dcp/Train_DCP.py:283-285)."""
    return jnp.mean(jnp.abs(pred_pts - gt_pts))


def gt_consistency_loss(R_pred, t_pred, R_gt, t_gt):
    """The reference's logged-only supervised loss
    mse(R_pred^T @ R_gt, I) + mse(t_pred, t_gt)
    (dcp/Train_DCP.py:393-397). R_* (..., 3, 3), t_* (..., 3)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R_pred.dtype), R_pred.shape)
    rr = jnp.matmul(jnp.swapaxes(R_pred, -1, -2), R_gt)
    return jnp.mean((rr - eye) ** 2) + jnp.mean((t_pred - t_gt) ** 2)


def dm_twist_error(g_hat, igt):
    """FMR's eval metric: mean L2 norm of the twist of g_hat @ igt
    (fmr/model.py:799-805 — identity composition means zero error).

    g_hat, igt: (B, 4, 4). Returns (dm_mean, per-sample dn (B,)).
    """
    dg = jnp.matmul(g_hat, igt)
    dx = jax.vmap(se3.log)(dg).reshape(dg.shape[0], 6)
    dn = jnp.linalg.norm(dx, axis=-1)
    return jnp.mean(dn), dn


def twist_csv_rows(g_hat, igt):
    """FMR eval CSV rows [h_w, h_v, g_w, g_v] = [log(g_hat), -log(igt)]
    (fmr/model.py:875-892). Returns (B, 12) float arrays."""
    x_hat = jax.vmap(se3.log)(g_hat).reshape(-1, 6)
    mx_gt = jax.vmap(se3.log)(igt).reshape(-1, 6)
    return jnp.concatenate([x_hat, -mx_gt], axis=-1)


TWIST_CSV_HEADER = ",".join(
    ["h_w1", "h_w2", "h_w3", "h_v1", "h_v2", "h_v3",
     "g_w1", "g_w2", "g_w3", "g_v1", "g_v2", "g_v3"]
)
