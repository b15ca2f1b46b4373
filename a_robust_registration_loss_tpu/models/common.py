"""Shared model components: quaternions, batched 3x3 SVD orientation
solving, and the reference's nonstandard LayerNorm.

All point tensors in this model zoo are channels-LAST (B, N, 3) — the
natural XLA layout — where the torch reference is channels-first (B, 3, N)
(e.g. dcp/model.py:491-513); the data layer adapts.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def quat2mat(quat):
    """Unit quaternion -> rotation matrix with the reference's (x, y, z, w)
    component ordering — NOT the usual (w, x, y, z)
    (reference: utils.py:52-67; consumed by DCP's MLPHead, dcp/model.py:362)."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    B = quat.shape[:-1]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(B + (3, 3))


def svd_orientation(H):
    """R = V diag(1,1,det) U^T from H = src_c src_corr_c^T, with the
    reflection fix (reference: dcp/model.py:437-455 — the per-sample torch
    loop becomes one batched jnp.linalg.svd; 3x3 SVDs are XLA-native).

    H: (..., 3, 3) -> proper rotations (..., 3, 3)."""
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R = jnp.matmul(V, jnp.swapaxes(U, -1, -2), precision=_HI)
    det = jnp.linalg.det(R)
    # det < 0: flip V's last column (reference multiplies V by diag(1,1,-1))
    V_fixed = V.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return jnp.matmul(V_fixed, jnp.swapaxes(U, -1, -2), precision=_HI)


def weighted_kabsch(a, b, weights):
    """Weighted rigid alignment a -> b (reference: rpm/models/rpmnet.py:121-157).

    a, b: (B, N, 3); weights: (B, N) (nonnegative). Returns (B, 3, 4)."""
    w = weights[..., None] / jnp.clip(
        jnp.sum(weights, axis=1, keepdims=True)[..., None], 1e-5, None
    )
    ca = jnp.sum(a * w, axis=1, keepdims=True)
    cb = jnp.sum(b * w, axis=1, keepdims=True)
    a_c, b_c = a - ca, b - cb
    H = jnp.einsum("bnc,bn,bnd->bcd", a_c, weights, b_c, precision=_HI)
    # rotation taking a to b: R = V S U^T with H = a^T diag(w) b
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R = jnp.matmul(V, jnp.swapaxes(U, -1, -2), precision=_HI)
    det = jnp.linalg.det(R)
    V_fixed = V.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    R = jnp.matmul(V_fixed, jnp.swapaxes(U, -1, -2), precision=_HI)
    t = -jnp.einsum("bij,bj->bi", R, ca[:, 0]) + cb[:, 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


class TorchLayerNorm(nn.Module):
    """The reference transformer's LayerNorm: a*(x-mean)/(std+eps)+b with
    *unbiased* std and eps added to std, not variance
    (reference: dcp/model.py:158-168).

    Statistics are always computed in fp32 (a no-op for fp32 inputs); the
    result is cast back to the input dtype, so bf16 activations stay bf16
    through the mixed-precision path."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("a", nn.initializers.ones, (d,))
        b = self.param("b", nn.initializers.zeros, (d,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.sum((x32 - mean) ** 2, axis=-1, keepdims=True) / (d - 1)
        std = jnp.sqrt(var)
        return (a * (x32 - mean) / (std + self.eps) + b).astype(x.dtype)


class TorchGroupNorm(nn.Module):
    """GroupNorm with torch's eps (1e-5) over the trailing channel axis;
    works on (B, N, C) pointwise features and (B, C) pooled features alike
    (the reference swapped every BatchNorm for GroupNorm so that the
    per-sample B=1 intersection loss calls behave, dcp/model.py:274-283)."""

    num_groups: int
    eps: float = 1e-5
    dtype: str | None = None  # result dtype ("bfloat16" for mixed precision);
    #                           stats are fp32 either way (flax default)

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        dt = jnp.dtype(self.dtype) if self.dtype is not None else None
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=dt)(x)
        return y[:, 0, :] if squeeze else y
