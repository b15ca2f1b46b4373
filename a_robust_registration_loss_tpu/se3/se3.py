"""SE(3): rigid transforms and twists, batched and jit/vmap/grad-able.

JAX re-design of the reference's SE(3) module (reference:
code/LieAlgebra/se3.py, triplicated in the reference as fmr/se_math/se3.py and
rpm/common/math_torch/se3.py — this is the single copy). Conventions match the
reference: a twist is ``x = (w, v)`` with rotation first; ``exp`` returns a
4x4 homogeneous matrix; ``exp3`` returns the (R, t) pair used by the
classical-optimization transform parameterization (reference: se3.py:83-106,
consumed by loss.py:455-456 as ``points @ R + t``).

The reference's custom autograd ``ExpMap`` (se3.py:156-191) is dropped: plain
``jax.grad`` through the NaN-safe sinc-based exp is exact.

Also includes the (B, 3, 4) "Rt" convention helpers the reference keeps in
rpm/common/math_torch/se3.py (identity/inverse/concatenate/transform), used by
the RPM-Net pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.se3 import so3

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
from a_robust_registration_loss_tpu.se3.sinc import sinc1, sinc2, sinc3


def twist_prod(x, y):
    """Lie bracket of twists (reference: se3.py:7-19)."""
    xw, xv = x[..., 0:3], x[..., 3:6]
    yw, yv = y[..., 0:3], y[..., 3:6]
    zw = jnp.cross(xw, yw)
    zv = jnp.cross(xw, yv) + jnp.cross(xv, yw)
    return jnp.concatenate([zw, zv], axis=-1)


liebracket = twist_prod


def mat(x):
    """hat: (..., 6) -> (..., 4, 4) (reference: se3.py:26-38)."""
    W = so3.mat(x[..., 0:3])
    v = x[..., 3:6][..., None]
    top = jnp.concatenate([W, v], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :])
    return jnp.concatenate([top, bottom], axis=-2)


hat = mat


def vec(X):
    """vee: (..., 4, 4) -> (..., 6) (reference: se3.py:41-46)."""
    return jnp.stack(
        [X[..., 2, 1], X[..., 0, 2], X[..., 1, 0],
         X[..., 0, 3], X[..., 1, 3], X[..., 2, 3]],
        axis=-1,
    )


vee = vec


def genvec():
    return jnp.eye(6)


def genmat():
    return mat(genvec())


def _R_V(x):
    w = x[..., 0:3]
    v = x[..., 3:6]
    t = so3.safe_norm(w)[..., None, None]
    W = so3.mat(w)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=x.dtype)
    R = I + sinc1(t) * W + sinc2(t) * S
    V = I + sinc2(t) * W + sinc3(t) * S
    p = _einsum("...ij,...j->...i", V, v)
    return R, p


def exp(x):
    """exp: (..., 6) twist -> (..., 4, 4) homogeneous (reference: se3.py:57-80)."""
    R, p = _R_V(x)
    g = jnp.zeros(x.shape[:-1] + (4, 4), dtype=x.dtype)
    g = g.at[..., :3, :3].set(R)
    g = g.at[..., :3, 3].set(p)
    g = g.at[..., 3, 3].set(1.0)
    return g


def exp3(x):
    """exp returning the (R, t) pair (reference: se3.py:83-106).

    Consumers apply it as ``points @ R + t`` (reference: loss.py:458-463),
    i.e. R is used row-vector style.
    """
    return _R_V(x)


def inverse(g):
    """(..., 4, 4) -> (..., 4, 4) (reference: se3.py:109-120)."""
    R = g[..., :3, :3]
    p = g[..., :3, 3]
    Q = jnp.swapaxes(R, -1, -2)
    q = -_einsum("...ij,...j->...i", Q, p)
    ig = jnp.zeros_like(g)
    ig = ig.at[..., :3, :3].set(Q)
    ig = ig.at[..., :3, 3].set(q)
    ig = ig.at[..., 3, 3].set(1.0)
    return ig


def log(g):
    """log: (..., 4, 4) -> (..., 6) via so3.log + inverse left Jacobian
    (reference: se3.py:124-134)."""
    R = g[..., :3, :3]
    p = g[..., :3, 3]
    w = so3.log(R)
    H = so3.inv_vecs_Xg_ig(w)
    v = _einsum("...ij,...j->...i", H, p)
    return jnp.concatenate([w, v], axis=-1)


def transform(g, a):
    """Apply g (..., 4, 4) to points a (..., 3) or (..., 3, N)
    (reference: se3.py:137-147)."""
    R = g[..., :3, :3]
    p = g[..., :3, 3]
    if g.ndim == a.ndim:
        return _mm(R, a) + p[..., None]
    return _einsum("...ij,...j->...i", R, a) + p


def group_prod(g, h):
    return _mm(g, h)


# ---------------------------------------------------------------------------
# (B, 3, 4) "Rt" convention (reference: rpm/common/math_torch/se3.py:6-83)
# ---------------------------------------------------------------------------

def rt_identity(batch_shape=(), dtype=jnp.float32):
    """Identity transforms of shape batch_shape + (3, 4)
    (reference: rpm/common/math_torch/se3.py:6-13)."""
    I = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1)
    return jnp.broadcast_to(I, tuple(batch_shape) + (3, 4))


def rt_inverse(g):
    """(..., 3, 4) -> (..., 3, 4) (reference: rpm/common/math_torch/se3.py:16-27)."""
    R = g[..., :3, :3]
    t = g[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    tt = -_einsum("...ij,...j->...i", Rt, t)
    return jnp.concatenate([Rt, tt[..., None]], axis=-1)


def rt_concatenate(a, b):
    """Compose: result = a . b (apply b first? No — reference composes
    a*b as matrix product of homogeneous forms, rpm/common/math_torch/se3.py:30-52)."""
    Ra, ta = a[..., :3, :3], a[..., :3, 3]
    Rb, tb = b[..., :3, :3], b[..., :3, 3]
    R = _mm(Ra, Rb)
    t = _einsum("...ij,...j->...i", Ra, tb) + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rt_transform(g, pts):
    """Apply g (..., 3, 4) to pts (..., N, 3)
    (reference: rpm/common/math_torch/se3.py:55-83)."""
    R = g[..., :3, :3]
    t = g[..., :3, 3]
    return _einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
