"""Fused Pallas TPU kernel for the line resampler's candidate stage.

The XLA resampler (ops/lines.py) evaluates a ~50-op sphere-sampling chain
plus a 24-triangle (two 12-face AABB meshes) rejection test over the whole
200k-candidate stream; as separate fused elementwise passes that chain
costs ~0.6 ms of the 3 ms classical step at the bench config. This kernel
runs the whole per-candidate pipeline — uniforms -> two sphere points ->
direction/origin -> 24 barycentric plane tests -> acceptance bit — in one
VMEM-streamed pass.

Contract vs the XLA path (reference semantics: loss.py:384-432):
- The four uniform streams are drawn OUTSIDE with ``jax.random`` and fed in,
  so the candidate distribution and RNG stream are identical to the XLA
  path by construction.
- Per-face constants (vertices, unit normal, parallelogram area) are
  precomputed OUTSIDE in XLA (bitwise-identical face prep both paths).
- Candidate math inside the kernel uses the same formulas in the same
  order; Mosaic's cos/sin/sqrt may differ from XLA's by ulps, so a
  candidate sitting exactly on an acceptance boundary can flip. Both paths
  draw from the same uniform-lines measure; in interpret mode (CPU tests)
  the kernel lowers to XLA ops and matches the reference path bitwise.

Output layout: (8, C) — rows 0-2 direction, 3-5 origin, 6 acceptance
(0.0/1.0), 7 zero — lane-major like the stage-1 kernel's line input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF = 12  # faces per AABB mesh


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(params_ref, u_ref, fv_ref, out_ref):
    """params (1, 8) SMEM: [r, cx, cy, cz, C, 0, 0, 0];
    u (8, TC) VMEM: rows 0-3 the uniform streams;
    fv (2*NF, 16) SMEM: per face [p0(3) p1(3) p2(3) nh(3) S pad(3)];
    out (8, TC) VMEM."""
    TC = u_ref.shape[1]
    r = params_ref[0, 0]
    cx, cy, cz = params_ref[0, 1], params_ref[0, 2], params_ref[0, 3]
    C = params_ref[0, 4]

    # NOTE: op-for-op the same arithmetic as ops/lines.py:sample_lines —
    # the barycentric acceptance test sits on a rounding knife edge (for a
    # point on the triangle plane A+B+C == S exactly in real arithmetic),
    # so ANY re-association flips labels; see module docstring.
    pi = 3.14159265358979323846

    def sphere(ua, uu):
        alpha = ua * 2.0 * pi          # same multiply order as sample_lines
        u = uu * 2.0 - 1.0
        s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
        return (r * (s * jnp.cos(alpha)), r * (s * jnp.sin(alpha)), r * u)

    q1 = sphere(u_ref[0, :], u_ref[1, :])
    q2 = sphere(u_ref[2, :], u_ref[3, :])
    d = [q2[c] - q1[c] for c in range(3)]
    norm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    den = jnp.maximum(norm, 1e-12)  # F.normalize semantics
    d = [d[c] / den for c in range(3)]
    o = (q1[0] + cx, q1[1] + cy, q1[2] + cz)

    def cloud_hit(base):
        """any-of-12-faces hit for one AABB mesh (same math as
        ops/lines.py:triangle_hits, with the per-face prep hoisted out)."""
        any_hit = None
        for f in range(NF):
            p0 = [fv_ref[base + f, c] for c in range(3)]
            p1 = [fv_ref[base + f, 3 + c] for c in range(3)]
            p2 = [fv_ref[base + f, 6 + c] for c in range(3)]
            nh = [fv_ref[base + f, 9 + c] for c in range(3)]
            S = fv_ref[base + f, 12]

            denom = nh[0] * d[0] + nh[1] * d[1] + nh[2] * d[2] + 1e-12
            tnum = (nh[0] * (p0[0] - o[0]) + nh[1] * (p0[1] - o[1])
                    + nh[2] * (p0[2] - o[2]))
            t = tnum / denom
            ix = t * d[0] + o[0]
            iy = t * d[1] + o[1]
            iz = t * d[2] + o[2]

            cA = (ix - p0[0], iy - p0[1], iz - p0[2])
            cB = (ix - p1[0], iy - p1[1], iz - p1[2])
            cC = (ix - p2[0], iy - p2[1], iz - p2[2])

            def area(u, v):
                w0 = u[1] * v[2] - u[2] * v[1]
                w1 = u[2] * v[0] - u[0] * v[2]
                w2 = u[0] * v[1] - u[1] * v[0]
                return jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)

            bA, bB, bC = area(cB, cC), area(cC, cA), area(cA, cB)
            hit = (bA > 0) & (bB > 0) & (bC > 0) & (bA + bB + bC <= S)
            any_hit = hit if any_hit is None else (any_hit | hit)
        return any_hit

    ok = cloud_hit(0) & cloud_hit(NF)
    # mask the padded tail of the candidate stream
    col = (pl.program_id(0) * TC
           + jax.lax.broadcasted_iota(jnp.int32, (TC,), 0))
    ok = ok & (col.astype(jnp.float32) < C)

    out_ref[0, :] = d[0]
    out_ref[1, :] = d[1]
    out_ref[2, :] = d[2]
    out_ref[3, :] = o[0]
    out_ref[4, :] = o[1]
    out_ref[5, :] = o[2]
    out_ref[6, :] = ok.astype(jnp.float32)
    out_ref[7, :] = jnp.zeros((TC,), jnp.float32)


def prep_faces(fvs1, fvs2):
    """(12, 9) x2 face-vertex tuples -> (24, 16) [p0 p1 p2 nh S pad] with the
    per-face normal/area prep done in XLA (bitwise-identical to
    ops/lines.py:triangle_hits' in-line prep)."""
    fvs = jnp.concatenate([fvs1, fvs2], axis=0)  # (24, 9)
    p0, p1, p2 = fvs[:, 0:3], fvs[:, 3:6], fvs[:, 6:9]
    e1, e2 = p1 - p0, p2 - p0
    n = jnp.cross(e1, e2)
    S = jnp.sqrt(n[:, 0] ** 2 + n[:, 1] ** 2 + n[:, 2] ** 2)
    inv = 1.0 / jnp.maximum(S, 1e-12)   # multiply-by-reciprocal, exactly
    nh = n * inv[:, None]               # like triangle_hits' prep
    pad = jnp.zeros((fvs.shape[0], 3), fvs.dtype)
    return jnp.concatenate([p0, p1, p2, nh, S[:, None], pad], axis=-1)


@functools.partial(jax.jit, static_argnames=("tc", "interpret"))
def sample_and_hit(u4, r, center, fv_prep, *, tc: int = 25600,
                   interpret: bool = False):
    """u4 (4, C) uniforms -> (cand (C, 6), ok (C,) bool).

    One pallas dispatch over C/tc tiles; r/center/C ride SMEM params."""
    C = u4.shape[1]
    Cp = _round_up(C, tc)
    u8 = jnp.zeros((8, Cp), jnp.float32).at[0:4, :C].set(u4)
    params = jnp.zeros((1, 8), jnp.float32)
    params = params.at[0, 0].set(r)
    params = params.at[0, 1:4].set(center.reshape(3))
    params = params.at[0, 4].set(jnp.float32(C))

    out = pl.pallas_call(
        _kernel,
        grid=(Cp // tc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, tc), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Cp), jnp.float32),
        interpret=interpret,
    )(params, u8, fv_prep)
    cand = out[0:6, :C].T
    ok = out[6, :C] > 0.5
    return cand, ok
