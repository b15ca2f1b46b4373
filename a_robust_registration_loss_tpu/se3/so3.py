"""SO(3): rotations and their Lie algebra, batched and jit/vmap/grad-able.

JAX re-design of the reference's SO(3) module (reference:
code/LieAlgebra/so3.py). Differences by design, not behavior:

- All functions operate on arrays of shape (..., 3) / (..., 3, 3); batching is
  by broadcasting, not ``.view(-1, ...)`` reshapes.
- The reference's per-sample ``btrace`` Python loop (so3.py:84-92) is a single
  einsum; its ``ExpMap`` custom autograd (so3.py:187-225) is unnecessary — the
  exp map here is built from NaN-safe sinc primitives and plain ``jax.grad``
  matches the analytic left-trivialized differential.
- ``log``'s t ~= pi branch replicates the reference's sqrt-of-diagonal trick
  (so3.py:110-128) with branchless ``where`` selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.se3.sinc import sinc1, sinc2, sinc3

# 3x3 Lie-algebra matmuls are numerics-critical and tiny; on TPU the default
# matmul precision is bfloat16, which destroys orthogonality in the 4th digit.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def safe_norm(w):
    """|w| with a NaN-free gradient at w = 0 (where the true differential of
    the surrounding sinc-based exp maps is 0 anyway)."""
    t2 = jnp.sum(w * w, axis=-1)
    zero = t2 == 0
    t = jnp.sqrt(jnp.where(zero, 1.0, t2))
    return jnp.where(zero, 0.0, t)


def cross_prod(x, y):
    return jnp.cross(x, y)


liebracket = cross_prod


def mat(x):
    """hat: (..., 3) -> (..., 3, 3) skew matrix (reference: so3.py:17-27)."""
    x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
    zero = jnp.zeros_like(x1)
    rows = jnp.stack(
        [
            jnp.stack([zero, -x3, x2], axis=-1),
            jnp.stack([x3, zero, -x1], axis=-1),
            jnp.stack([-x2, x1, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


hat = mat


def vec(X):
    """vee: (..., 3, 3) -> (..., 3) (reference: so3.py:30-34)."""
    return jnp.stack([X[..., 2, 1], X[..., 0, 2], X[..., 1, 0]], axis=-1)


vee = vec


def genvec():
    return jnp.eye(3)


def genmat():
    return mat(genvec())


def btrace(X):
    return _einsum("...ii->...", X)


def exp(w):
    """Rodrigues exp map (..., 3) -> (..., 3, 3) (reference: so3.py:62-75)."""
    t = safe_norm(w)[..., None, None]
    W = mat(w)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=w.dtype)
    return I + sinc1(t) * W + sinc2(t) * S


def inverse(R):
    return jnp.swapaxes(R, -1, -2)


def log(R):
    """Log map with the t ~= pi branch (reference: so3.py:95-131).

    Main branch: X = (R - R^T) / (2 sinc1(t)), t = acos((tr - 1)/2).
    Near t = pi (|sinc1(t)| <= 1e-7) the reference recovers |w_i| from the
    diagonal of A = (R + I) t^2 / 2 and signs from A[0,2], A[1,2] (zero sign
    treated as +). We clamp the acos argument to [-1, 1] (the reference does
    not and NaNs on numerically out-of-range traces — a safe fix).
    """
    eps = 1.0e-7
    c = jnp.clip((btrace(R) - 1) / 2, -1.0, 1.0)
    t = jnp.arccos(c)
    sc = sinc1(t)
    near_pi = jnp.abs(sc) <= eps

    # main branch — guard the divisor inside the dead region
    sc_safe = jnp.where(near_pi, 1.0, sc)[..., None, None]
    X_main = (R - jnp.swapaxes(R, -1, -2)) / (2 * sc_safe)

    # pi branch
    t2 = (t**2)[..., None, None]
    A = (R + jnp.eye(3, dtype=R.dtype)) * t2 / 2
    aw1 = jnp.sqrt(jnp.maximum(A[..., 0, 0], 0.0))
    aw2 = jnp.sqrt(jnp.maximum(A[..., 1, 1], 0.0))
    aw3 = jnp.sqrt(jnp.maximum(A[..., 2, 2], 0.0))
    sgn_3 = jnp.where(jnp.sign(A[..., 0, 2]) == 0, 1.0, jnp.sign(A[..., 0, 2]))
    sgn_23 = jnp.where(jnp.sign(A[..., 1, 2]) == 0, 1.0, jnp.sign(A[..., 1, 2]))
    sgn_2 = sgn_23 * sgn_3
    w_pi = jnp.stack([aw1, aw2 * sgn_2, aw3 * sgn_3], axis=-1)
    X_pi = mat(w_pi)

    X = jnp.where(near_pi[..., None, None], X_pi, X_main)
    return vec(X)


def transform(R, a):
    """Apply rotation: R (..., 3, 3), a (..., 3) or (..., 3, N) (reference: so3.py:134-141)."""
    if R.ndim == a.ndim:
        return _mm(R, a)
    return _einsum("...ij,...j->...i", R, a)


def group_prod(g, h):
    return _mm(g, h)


def vecs_Xg_ig(w):
    """Left Jacobian V with V = I + sinc2 W + sinc3 W^2 (reference: so3.py:150-165)."""
    t = safe_norm(w)[..., None, None]
    W = mat(w)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=w.dtype)
    return I + sinc2(t) * W + sinc3(t) * S


def inv_vecs_Xg_ig(w):
    """Inverse left Jacobian H = I - W/2 + eta(t) W^2 (reference: so3.py:168-184).

    eta(t) = (1 - (t/2)/tan(t/2)) / t^2, Taylor O(t^8) for t < 0.01.
    """
    t = safe_norm(w)[..., None, None]
    W = mat(w)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=w.dtype)

    small = t < 0.01
    t_safe = jnp.where(small, 1.0, t)
    t2 = t**2
    eta_small = ((t2 / 40 + 1) * t2 / 42 + 1) * t2 / 720 + 1 / 12
    eta_exact = (1 - (t_safe / 2) / jnp.tan(t_safe / 2)) / t_safe**2
    eta = jnp.where(small, eta_small, eta_exact)
    return I - 0.5 * W + eta * S
