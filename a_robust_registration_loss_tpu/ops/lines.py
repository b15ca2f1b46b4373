"""Uniform random line sampling with bbox rejection resampling.

TPU-native re-design of the reference's line machinery
(code/loss.py:255-432). The measure is the paper's uniform distribution on
lines through a radius-r bounding sphere: two independent uniform points on
the sphere (via (alpha, u) in [0, 2pi] x [-1, 1]), direction = their
normalized difference, origin = first point + cloud center
(reference: loss.py:384-412).

The resampler keeps only lines whose coarse 12-triangle AABB meshes of BOTH
clouds are hit (reference: loss.py:415-432), over a fixed budget of 10
rounds. The reference fills a Python-dict-countered buffer with host-synced
``.nonzero()`` selections (loss.py:365-381); here it is a fully-on-device
masked scatter fill (cumsum ranks + dropped out-of-range writes) inside a
``fori_loop`` — jit-compatible, zero host syncs, identical distribution
(first-accepted-first-stored, zero-filled tail when the budget runs out; the
zero lines intersect nothing downstream, exactly as in the reference).

RNG is ``jax.random`` (counter-based, fork-safe) instead of torch's global
generator: cross-framework parity holds at the distribution level, and
golden-value parity of everything downstream is established by feeding both
implementations identical line sets (see tests/test_metric.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.ops import geometry as G


def _sphere_points(key, r, n):
    k1, k2 = jax.random.split(key)
    alpha = jax.random.uniform(k1, (n,)) * 2 * jnp.pi
    u = jax.random.uniform(k2, (n,)) * 2.0 - 1.0
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    return r * jnp.stack([s * jnp.cos(alpha), s * jnp.sin(alpha), u], axis=-1)


def sample_lines(key, r, center, n: int):
    """n uniform random lines through the radius-r sphere at ``center``:
    (n, 6) rows of [direction(3) | point(3)] (reference: loss.py:384-412)."""
    k1, k2 = jax.random.split(key)
    q1 = _sphere_points(k1, r, n)
    q2 = _sphere_points(k2, r, n)
    direction = q2 - q1
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.maximum(norm, 1e-12)  # F.normalize semantics
    x0 = q1 + center.reshape(1, 3)
    return jnp.concatenate([direction, x0], axis=-1)


def triangle_hits(face_vertices, lines):
    """Coarse line-vs-triangle-soup hit counts (reference: loss.py:265-322).

    face_vertices: (F, 9) triangles as [p0|p1|p2]; lines: (L, 6).
    Plane intersection parameter via face normals, then the barycentric
    parallelogram-area test A>0 and B>0 and C>0 and A+B+C <= S.
    Returns (L,) int32 hit counts (the line is infinite: t may be negative).
    """
    p0, p1, p2 = face_vertices[:, 0:3], face_vertices[:, 3:6], face_vertices[:, 6:9]
    normals = jnp.cross(p1 - p0, p2 - p0)  # (F, 3)
    S = jnp.linalg.norm(normals, axis=-1)
    n_hat = normals / jnp.maximum(S, 1e-12)[:, None]

    dirs = lines[:, None, :3]  # (L, 1, 3)
    x0 = lines[:, None, 3:]
    t = jnp.sum(n_hat[None] * (p0[None] - x0), -1) / (
        jnp.sum(n_hat[None] * dirs, -1) + 1e-12
    )  # (L, F)
    inter = t[..., None] * dirs + x0  # (L, F, 3)
    cA = inter - p0[None]
    cB = inter - p1[None]
    cC = inter - p2[None]
    bA = jnp.linalg.norm(jnp.cross(cB, cC), axis=-1)
    bB = jnp.linalg.norm(jnp.cross(cC, cA), axis=-1)
    bC = jnp.linalg.norm(jnp.cross(cA, cB), axis=-1)
    label = (bA > 0) & (bB > 0) & (bC > 0) & (bA + bB + bC <= S[None])
    return jnp.sum(label, axis=-1).astype(jnp.int32)


def resample_lines(key, r, center, n: int, vertices1, vertices2,
                   rounds: int = 10):
    """Rejection resampling of n lines hitting both clouds' AABB meshes
    (reference: loss.py:415-432; 10 rounds is the reference's budget).

    vertices1/2: (N, 3). Returns (n, 6); the tail stays zero-filled if the
    budget is exhausted (zero lines intersect nothing downstream).
    """
    fvs1 = G.bbox_face_vertices(vertices1[None])[0]  # (12, 9)
    fvs2 = G.bbox_face_vertices(vertices2[None])[0]
    keys = jax.random.split(key, rounds)

    def body(i, carry):
        buf, cnt = carry
        new = sample_lines(keys[i], r, center, n)
        ok = (triangle_hits(fvs1, new) > 0) & (triangle_hits(fvs2, new) > 0)
        pos = cnt + jnp.cumsum(ok.astype(jnp.int32)) - 1
        idx = jnp.where(ok & (pos < n), pos, n)  # n == dropped
        buf = buf.at[idx].set(new, mode="drop")
        cnt = jnp.minimum(cnt + jnp.sum(ok.astype(jnp.int32)), n)
        return buf, cnt

    buf = jnp.zeros((n, 6), vertices1.dtype)
    buf, _ = jax.lax.fori_loop(0, rounds, body, (buf, jnp.int32(0)))
    return buf
