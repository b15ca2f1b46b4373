"""RPM-Net (early fusion) as Flax modules.

Re-design of the reference's rpm/models/{rpmnet,feature_nets,pointnet_util}.py
for TPU: channels-last tensors, batched SVD Kabsch (no .clone() V-flips), the
ball-query sort-truncate-backfill as masked sorts, and the iteration loop as
a plain Python loop over a static num_iter (the reference detaches the
transform between iterations, rpm/models/rpmnet.py:223-224 — replicated).

Parity notes:
- sinkhorn: log-domain, optional slack row/column which are zero-padded and
  NOT normalized (rpmnet.py:48-118).
- affinity: -beta (d - alpha) with beta, alpha = softplus of a PointNet over
  the 0/1-flag-padded union cloud (feature_nets.py:15-88).
- hybrid features: xyz / dxyz / ppf over radius ball groups with
  self-exclusion (pointnet_util.py:96-131, 197-244), PPF angles via
  atan2(|cross|, dot) (pointnet_util.py:173-194).
- compute_rigid_transform: weights normalized with +1e-5, cov of centered
  clouds, +/-V determinant disambiguation (rpmnet.py:121-157).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.models.common import TorchGroupNorm
from a_robust_registration_loss_tpu.ops import geometry as G

_HI = jax.lax.Precision.HIGHEST
_EPS = 1e-5  # reference rpmnet.py:16


@dataclasses.dataclass(frozen=True)
class RPMNetConfig:
    """Mirrors rpm/arguments.py defaults (features/radius/neighbors/sinkhorn)."""

    features: Sequence[str] = ("ppf", "dxyz", "xyz")
    feat_dim: int = 96
    radius: float = 0.3
    num_neighbors: int = 64
    num_sk_iter: int = 5
    add_slack: bool = True
    anneal: str = "net"  # "net" | "constant": the reference's ablation swap
    #                      (feature_nets.py:91-115, rpm/models/rpmnet.py:11)
    # Mixed precision (TPU MXU): compute dtype for the feature nets and the
    # annealing PointNet. Params stay fp32; the ball query / PPF geometry,
    # the L2 feature normalization, sinkhorn, and Kabsch stay fp32. The
    # reference is fp32-only; this is an opt-in TPU performance mode.
    dtype: str = "float32"


def angle(v1, v2):
    """atan2(|v1 x v2|, v1 . v2) (reference: pointnet_util.py:173-194)."""
    cross = jnp.cross(v1, v2)
    return jnp.arctan2(jnp.linalg.norm(cross, axis=-1), jnp.sum(v1 * v2, -1))


def query_ball_point_excl(radius, nsample, xyz, new_xyz, itself_indices):
    """Ball query excluding the center point itself, backfilled with the
    center index (reference: rpm/models/pointnet_util.py:96-131)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = G.square_distance(new_xyz, xyz)
    group_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    # knock out the center point
    self_mask = group_idx == itself_indices[:, :, None]
    group_idx = jnp.where(self_mask | (sqrdists > radius**2), N, group_idx)
    # k-smallest selection instead of a full row sort (G._smallest_k note)
    group_idx = G._smallest_k(group_idx, nsample)
    backfill = jnp.broadcast_to(itself_indices[:, :, None], group_idx.shape)
    return jnp.where(group_idx == N, backfill, group_idx).astype(jnp.int32)


def _group_gather(xyz, normals, idx):
    """Gather neighbor xyz+normals for (B, N, nsample) cluster indices.

    RPM's single hottest op on TPU. Measured at B=4, N=1024, ns=64 (fp32,
    v5e): two separate per-table ``take_along_axis`` gathers cost 4.9 ms of
    the 5.7 ms grouping stage; ONE fused C=6 gather over the concatenated
    table via a flat global ``jnp.take`` costs 2.2 ms (take_along_axis 3.3,
    per-batch vmap take 4.6, lane-axis gather 21.2, MXU one-hot Pallas
    kernel 4.1 — see ops/pallas/gather.py for why the one-hot loses at
    C=6). Values are bit-identical to the two-gather form; the reference
    does the same selection via torch fancy indexing
    (rpm/models/pointnet_util.py:96-131).
    """
    B, N, ns = idx.shape
    table = jnp.concatenate([xyz, normals], axis=-1).reshape(B * N, 6)
    off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    out = jnp.take(table, (idx + off).reshape(-1), axis=0)
    out = out.reshape(B, N, ns, 6)
    return out[..., :3], out[..., 3:]


def sample_and_group_multi(radius, nsample, xyz, normals):
    """xyz / dxyz / ppf cluster features over all points (npoint == -1 path,
    the only one RPM-Net uses; reference: pointnet_util.py:197-244)."""
    B, N, _ = xyz.shape
    itself = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    idx = query_ball_point_excl(radius, nsample, xyz, xyz, itself)
    grouped_xyz, ni = _group_gather(xyz, normals, idx)
    d = grouped_xyz - xyz[:, :, None, :]
    nr = normals[:, :, None, :]
    ppf = jnp.stack(
        [angle(nr, d), angle(ni, d), angle(jnp.broadcast_to(nr, ni.shape), ni),
         jnp.linalg.norm(d, axis=-1)],
        axis=-1,
    )
    return {"xyz": xyz, "dxyz": d, "ppf": ppf}


_RAW_SIZES = {"xyz": 3, "dxyz": 3, "ppf": 4}
_RAW_ORDER = {"xyz": 0, "dxyz": 1, "ppf": 2}


class ParameterPredictionNet(nn.Module):
    """Annealing-parameter PointNet (reference: feature_nets.py:15-88)."""

    dtype: str = "float32"

    @nn.compact
    def __call__(self, src, ref):  # (B, J, 3), (B, K, 3)
        src_p = jnp.pad(src, ((0, 0), (0, 0), (0, 1)), constant_values=0.0)
        ref_p = jnp.pad(ref, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)
        x = jnp.concatenate([src_p, ref_p], axis=1)  # (B, J+K, 4)
        for width, groups in [(64, 8), (64, 8), (64, 8), (128, 8), (1024, 16)]:
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = TorchGroupNorm(groups, dtype=self.dtype)(x)
            x = nn.relu(x)
        pooled = jnp.max(x, axis=1)  # (B, 1024)
        y = nn.Dense(512, dtype=self.dtype)(pooled)
        y = TorchGroupNorm(16, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(256, dtype=self.dtype)(y)
        y = TorchGroupNorm(16, dtype=self.dtype)(y)
        y = nn.relu(y)
        raw = nn.Dense(2)(y.astype(jnp.float32))  # beta/alpha head in fp32
        beta = jax.nn.softplus(raw[:, 0])
        alpha = jax.nn.softplus(raw[:, 1])
        return beta, alpha


class ParameterPredictionNetConstant(nn.Module):
    """Learnable-constant ablation variant (feature_nets.py:91-115)."""

    @nn.compact
    def __call__(self, src, ref):
        raw = self.param("anneal_weights", nn.initializers.zeros, (2,))
        B = src.shape[0]
        beta = jnp.broadcast_to(jax.nn.softplus(raw[0]), (B,))
        alpha = jnp.broadcast_to(jax.nn.softplus(raw[1]), (B,))
        return beta, alpha


class FeatExtractionEarlyFusion(nn.Module):
    """Hybrid per-point features, L2-normalized (feature_nets.py:155-205)."""

    cfg: RPMNetConfig

    @nn.compact
    def __call__(self, xyz, normals):
        cfg = self.cfg
        feats = sample_and_group_multi(cfg.radius, cfg.num_neighbors, xyz, normals)
        feats["xyz"] = feats["xyz"][:, :, None, :]
        order = sorted(cfg.features, key=lambda f: _RAW_ORDER[f])
        ns = cfg.num_neighbors
        concat = [jnp.broadcast_to(feats[f], feats[f].shape[:2] + (ns,) + feats[f].shape[-1:])
                  for f in order]
        x = jnp.concatenate(concat, axis=-1)  # (B, N, ns, raw)

        out = cfg.feat_dim * 2
        dt = cfg.dtype
        for width in [out // 2, out // 2, out]:  # prepool (feature_nets.py:118-131)
            x = nn.Dense(width, dtype=dt)(x)
            x = TorchGroupNorm(8, dtype=dt)(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=2)  # pool over cluster -> (B, N, out)
        # postpool (feature_nets.py:134-152): conv-GN-relu, conv-GN-relu, conv
        x2 = nn.Dense(out, dtype=dt)(x)
        x2 = TorchGroupNorm(8, dtype=dt)(x2)
        x2 = nn.relu(x2)
        x2 = nn.Dense(cfg.feat_dim, dtype=dt)(x2)
        x2 = TorchGroupNorm(8, dtype=dt)(x2)
        x2 = nn.relu(x2)
        x2 = nn.Dense(cfg.feat_dim, dtype=dt)(x2)
        x2 = x2.astype(jnp.float32)  # normalize + match in fp32
        return x2 / jnp.linalg.norm(x2, axis=-1, keepdims=True)


def sinkhorn(log_alpha, n_iters: int = 5, slack: bool = True):
    """Log-domain Sinkhorn with optional unnormalized slack row/col
    (reference: rpmnet.py:48-118). log_alpha: (B, J, K) -> log perm matrix."""
    if not slack:
        for _ in range(n_iters):
            log_alpha = log_alpha - jax.nn.logsumexp(log_alpha, axis=2, keepdims=True)
            log_alpha = log_alpha - jax.nn.logsumexp(log_alpha, axis=1, keepdims=True)
        return log_alpha
    B, J, K = log_alpha.shape
    padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))
    for _ in range(n_iters):
        rows = padded[:, :-1, :] - jax.nn.logsumexp(padded[:, :-1, :], axis=2, keepdims=True)
        padded = jnp.concatenate([rows, padded[:, -1:, :]], axis=1)
        cols = padded[:, :, :-1] - jax.nn.logsumexp(padded[:, :, :-1], axis=1, keepdims=True)
        padded = jnp.concatenate([cols, padded[:, :, -1:]], axis=2)
    return padded[:, :-1, :-1]


def match_features(feat_src, feat_ref):
    """Squared-L2 feature distance matrix (reference: rpmnet.py:19-45)."""
    return G.square_distance(feat_src, feat_ref)


def compute_rigid_transform(a, b, weights):
    """Weighted Kabsch a -> b, (B, 3, 4) (reference: rpmnet.py:121-157)."""
    w = weights[..., None] / (jnp.sum(weights[..., None], axis=1, keepdims=True) + _EPS)
    ca = jnp.sum(a * w, axis=1)
    cb = jnp.sum(b * w, axis=1)
    a_c = a - ca[:, None, :]
    b_c = b - cb[:, None, :]
    cov = jnp.matmul(jnp.swapaxes(a_c, -1, -2), b_c * w, precision=_HI)
    U, _, Vt = jnp.linalg.svd(cov)
    V = jnp.swapaxes(Vt, -1, -2)
    R_pos = jnp.matmul(V, jnp.swapaxes(U, -1, -2), precision=_HI)
    V_neg = V.at[:, :, 2].multiply(-1.0)
    R_neg = jnp.matmul(V_neg, jnp.swapaxes(U, -1, -2), precision=_HI)
    R = jnp.where((jnp.linalg.det(R_pos) > 0)[:, None, None], R_pos, R_neg)
    t = -jnp.einsum("bij,bj->bi", R, ca) + cb
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rt_transform_points_normals(g, pts, normals):
    """Apply (B, 3, 4) to points and rotate normals
    (reference: rpm/common/math_torch/se3.py:55-83)."""
    R = g[..., :3, :3]
    t = g[..., :3, 3]
    p = jnp.einsum("bij,bnj->bni", R, pts) + t[:, None, :]
    n = jnp.einsum("bij,bnj->bni", R, normals)
    return p, n


class RPMNetEarlyFusion(nn.Module):
    """The trainable early-fusion RPM-Net (reference: rpmnet.py:160-256)."""

    cfg: RPMNetConfig = RPMNetConfig()

    def setup(self):
        self.weights_net = (ParameterPredictionNetConstant()
                            if self.cfg.anneal == "constant"
                            else ParameterPredictionNet(dtype=self.cfg.dtype))
        self.feat_extractor = FeatExtractionEarlyFusion(self.cfg)

    def __call__(self, xyz_src, norm_src, xyz_ref, norm_ref, num_iter: int = 2):
        """Returns (transforms [list of (B, 3, 4) per iter], endpoints)."""
        endpoints = {"perm_matrices": [], "beta": [], "alpha": []}
        xyz_src_t, norm_src_t = xyz_src, norm_src
        transforms = []
        for _ in range(num_iter):
            beta, alpha = self.weights_net(xyz_src_t, xyz_ref)
            feat_src = self.feat_extractor(xyz_src_t, norm_src_t)
            feat_ref = self.feat_extractor(xyz_ref, norm_ref)
            dist = match_features(feat_src, feat_ref)
            affinity = -beta[:, None, None] * (dist - alpha[:, None, None])
            log_perm = sinkhorn(affinity, self.cfg.num_sk_iter, self.cfg.add_slack)
            perm = jnp.exp(log_perm)
            weighted_ref = jnp.matmul(perm, xyz_ref, precision=_HI) / (
                jnp.sum(perm, axis=2, keepdims=True) + _EPS
            )
            transform = compute_rigid_transform(xyz_src, weighted_ref,
                                                jnp.sum(perm, axis=2))
            xyz_src_t, norm_src_t = rt_transform_points_normals(
                jax.lax.stop_gradient(transform), xyz_src, norm_src
            )
            transforms.append(transform)
            endpoints["perm_matrices"].append(perm)
            endpoints["beta"].append(beta)
            endpoints["alpha"].append(alpha)
        return transforms, endpoints
