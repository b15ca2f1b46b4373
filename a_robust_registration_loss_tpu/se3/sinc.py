"""Cardinal-sine family with NaN-safe small-angle Taylor branches.

JAX re-design of the reference's sinc library (reference:
code/LieAlgebra/sinc.py:5-146). The reference implements each function with
boolean-mask in-place writes and wraps them in hand-written autograd Functions
(code/LieAlgebra/sinc.py:164-226) because torch's masked assignment breaks
autodiff at the branch point. In JAX none of that is needed: we use the
"double-where" idiom so that *both* branches are finite for value and gradient,
and plain `jax.grad` is exact everywhere, including t == 0.

The Taylor branch threshold (|t| < 0.01) and the O(t^8) polynomials match the
reference exactly so numerics agree bitwise-to-tolerance on either side of the
switch. ``sinc4`` (dead code with a missing return in the reference,
code/LieAlgebra/sinc.py:149-161) is intentionally dropped.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 0.01


def _branch(t, small_fn, exact_fn, safe: float = 1.0):
    """where(|t|<eps, taylor(t), exact(t)), safe for value and grad.

    ``exact_fn`` is evaluated at ``safe`` inside the small region so its
    derivative never sees a 0-division; ``small_fn`` (a polynomial) is finite
    everywhere so it needs no guarding.
    """
    small = jnp.abs(t) < _SMALL
    t_safe = jnp.where(small, jnp.asarray(safe, t.dtype), t)
    return jnp.where(small, small_fn(t), exact_fn(t_safe))


def sinc1(t):
    """sin(t)/t  (reference: code/LieAlgebra/sinc.py:5-17)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: 1 - t**2 / 6 * (1 - t**2 / 20 * (1 - t**2 / 42)),
        lambda t: jnp.sin(t) / t,
    )


def sinc1_dt(t):
    """d/dt sin(t)/t  (reference: code/LieAlgebra/sinc.py:19-31)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: -t / 3 * (1 - t**2 / 10 * (1 - t**2 / 28 * (1 - t**2 / 54))),
        lambda t: jnp.cos(t) / t - jnp.sin(t) / t**2,
    )


def rsinc1(t):
    """t/sin(t)  (reference: code/LieAlgebra/sinc.py:48-60)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: (((31 * t**2) / 42 + 7) * t**2 / 60 + 1) * t**2 / 6 + 1,
        lambda t: t / jnp.sin(t),
    )


def sinc2(t):
    """(1 - cos(t))/t**2  (reference: code/LieAlgebra/sinc.py:91-103)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: 0.5 * (1 - t**2 / 12 * (1 - t**2 / 30 * (1 - t**2 / 56))),
        lambda t: (1 - jnp.cos(t)) / t**2,
    )


def sinc2_dt(t):
    """d/dt sinc2  (reference: code/LieAlgebra/sinc.py:105-117)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: -t / 12 * (1 - t**2 / 5 * (1.0 / 3 - t**2 / 56 * (0.5 - t**2 / 135))),
        lambda t: jnp.sin(t) / t**2 - 2 * (1 - jnp.cos(t)) / t**3,
    )


def sinc3(t):
    """(t - sin(t))/t**3  (reference: code/LieAlgebra/sinc.py:120-132)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: 1 / 6 * (1 - t**2 / 20 * (1 - t**2 / 42 * (1 - t**2 / 72))),
        lambda t: (t - jnp.sin(t)) / t**3,
    )


def sinc3_dt(t):
    """d/dt sinc3  (reference: code/LieAlgebra/sinc.py:134-146)."""
    t = jnp.asarray(t)
    return _branch(
        t,
        lambda t: -t / 60 * (1 - t**2 / 21 * (1 - t**2 / 24 * (0.5 - t**2 / 165))),
        lambda t: (3 * jnp.sin(t) - t * (jnp.cos(t) + 2)) / t**4,
    )
