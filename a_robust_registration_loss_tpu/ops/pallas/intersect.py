"""Fused Pallas TPU kernel for metric stage 1: line-neighborhood intersection.

Replaces the O(L*F*nnei) materialized tensors of both the torch reference
(code/loss.py:68-112 — the reason for its >=15 GB memory demand,
README.md:8) and the plain-XLA path: streams (face-tile x line-tile) blocks
through VMEM, computing the three point-line distances, the adaptive-
threshold intersection predicate, per-line intersection counts, and packing
the first-kmax intersected neighborhoods (index + raw distances) into fixed
slot buffers — all in one pass with nothing O(L*F) ever written to HBM.

Layout: everything is lane-major over LINES — inputs arrive transposed
(components on sublanes, lines/faces on lanes), per-line accumulators are
(row, L)-shaped so slot updates are full-lane row writes, and the in-tile
hit ranking is an inclusive prefix sum over the face (sublane) axis done as
ONE MXU matmul with a lower-triangular mask (binary inputs, so fp32-exact)
— no scalar loops, no per-lane strided writes, no log-step shuffles.

The kernel is forward-only by design: stage 1 is non-differentiable in the
reference too (detached weights, boolean labels — loss.py:92,107-112); the
differentiable reconstruction happens outside in plain JAX
(ops/metric.py: reconstruct_intersection_points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NNEI = 3
KMAX = 4


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(lines_ref, p_ref, count_ref, slot_idx_ref, slot_d_ref,
            slot_r_ref, cnt_acc, idx_acc, d_acc, r_acc):
    """Grid: (line_tiles, face_tiles); face tile index j advances fastest, so
    the per-line accumulators in VMEM scratch carry across the F sweep.

    lines_ref: (8, TL)  rows 0-2 = direction, 3-5 = origin (6,7 padding)
    p_ref:     (16, TF) rows 0-8 = the 3 neighbors' xyz, row 9 = squared
               threshold (-inf on padded faces encodes face validity; rest
               of the rows are layout padding)
    outputs (per line tile): count (1, TL), slot_idx (KMAX, TL),
               slot_d (KMAX*NNEI, TL), slot_r (KMAX*3, TL)
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    TF = p_ref.shape[1]
    TL = lines_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        cnt_acc[:] = jnp.zeros_like(cnt_acc)
        idx_acc[:] = jnp.full_like(idx_acc, 2**30)
        d_acc[:] = jnp.zeros_like(d_acc)
        r_acc[:] = jnp.zeros_like(r_acc)

    thr2 = p_ref[9, :]  # (TF,) squared threshold (delta*1.731/2)^2 - 2e-4

    # d_perp^2(f, l, i) = |p - x0|^2 - ((p - x0) . dir)^2, accumulated per
    # component to match the reference's direct (un-expanded) rounding.
    label = None
    d2 = []
    for i in range(NNEI):
        d_ac = jnp.zeros((TF, TL), jnp.float32)
        proj = jnp.zeros((TF, TL), jnp.float32)
        for c in range(3):
            diff = p_ref[3 * i + c, :][:, None] - lines_ref[3 + c, :][None, :]
            d_ac += diff * diff
            proj += diff * lines_ref[c, :][None, :]
        d2_i = d_ac - proj * proj
        d2.append(d2_i)
        ok = d2_i < thr2[:, None]
        label = ok if label is None else (label & ok)
    # padded faces carry thr2 == -inf, so their labels are already False

    # raw weighted reconstruction wp_c = sum_i (d_i / sum_j d_j) * p_i_c per
    # (face, line) pair — the same op sequence as the XLA glue (sqrt of
    # d2 + 2e-4, normalize, weight), so selected slots match it exactly
    # max(., 0) guards the sqrt against fp-cancellation negatives on padded
    # or far faces (never selected, but NaN * 0 would poison the reductions);
    # exact no-op for the selected faces (their d2 + 2e-4 > 0)
    d = [jnp.sqrt(jnp.maximum(d2[i] + 2e-4, 0.0)) for i in range(NNEI)]
    dsum = d[0] + d[1] + d[2]
    wp = []
    for c in range(3):
        acc = jnp.zeros((TF, TL), jnp.float32)
        for i in range(NNEI):
            acc += (d[i] / dsum) * p_ref[3 * i + c, :][:, None]
        wp.append(acc)

    hits = label.astype(jnp.float32)  # (TF, TL)
    # inclusive prefix-sum over faces via one MXU matmul with a lower-
    # triangular mask; binary inputs keep fp32 accumulation exact.
    row = jax.lax.broadcasted_iota(jnp.int32, (TF, TF), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TF, TF), 1)
    tri = (row >= col).astype(jnp.float32)
    csum = jnp.dot(tri, hits, preferred_element_type=jnp.float32)  # (TF, TL)
    rank = csum - hits + cnt_acc[0, :][None, :]  # exclusive rank + carry

    face_ids = (j * TF + jax.lax.broadcasted_iota(jnp.int32, (TF, TL), 0)).astype(
        jnp.float32
    )

    for s in range(KMAX):
        m = hits * (jnp.abs(rank - s) < 0.5)  # one-hot over faces per line
        got = jnp.sum(m, axis=0)  # (TL,) 0/1
        idx_s = jnp.sum(m * face_ids, axis=0)
        take = got > 0.5
        idx_acc[s, :] = jnp.where(take, idx_s.astype(jnp.int32), idx_acc[s, :])
        for i in range(NNEI):
            v = jnp.sum(m * d2[i], axis=0)
            d_acc[s * NNEI + i, :] = jnp.where(take, v, d_acc[s * NNEI + i, :])
        for c in range(3):
            r = jnp.sum(m * wp[c], axis=0)
            r_acc[s * 3 + c, :] = jnp.where(take, r, r_acc[s * 3 + c, :])

    cnt_acc[0, :] += jnp.sum(hits, axis=0).astype(jnp.int32)

    @pl.when(j == n_j - 1)
    def _emit():
        count_ref[:] = cnt_acc[:]
        slot_idx_ref[:] = idx_acc[:]
        slot_d_ref[:] = d_acc[:]
        slot_r_ref[:] = r_acc[:]


@functools.partial(jax.jit, static_argnames=("tl", "tf", "interpret"))
def intersect_stage1(point_neis, lines, delta, *, tl: int = 2048, tf: int = 256,
                     interpret: bool = False):
    """Fused stage 1. point_neis (F, 9), lines (L, 6), delta (F,) adaptive
    thresholds. Returns (count (L,) int32, slot_idx (L, 4) int32 with 2**30
    for empty, slot_d2 (L, 4, 3) raw perpendicular d^2 values *without* the
    +2e-4 which the caller re-adds under sqrt, slot_recon (L, 4, 3) — the
    raw weighted reconstruction sum_i w_i p_i per slot, emitted in-kernel so
    consumers skip the slow XLA row-gather of neighbor coordinates)."""
    point_neis = jax.lax.stop_gradient(point_neis)
    lines = jax.lax.stop_gradient(lines)
    F = point_neis.shape[0]
    L = lines.shape[0]
    Fp = _round_up(F, tf)
    Lp = _round_up(L, tl)

    thr = (delta * (1.731 / 2.0)) ** 2 - 2e-4
    # packed face tensor: rows 0-8 neighbors, row 9 threshold (-inf on
    # padded faces, which keeps their labels False with no extra mask)
    p_packed = jnp.zeros((16, Fp), jnp.float32)
    p_packed = p_packed.at[0:9, :F].set(point_neis.T)
    p_packed = p_packed.at[9, :F].set(thr)
    p_packed = p_packed.at[9, F:].set(-jnp.inf)

    # padded lines: zero direction, far-away origin -> never intersect
    l_packed = jnp.zeros((8, Lp), jnp.float32)
    l_packed = l_packed.at[5, :].set(1e9)
    l_packed = l_packed.at[0:6, :L].set(lines.T)

    grid = (Lp // tl, Fp // tf)
    count, slot_idx, slot_d, slot_r = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tl), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tl), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((KMAX, tl), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((KMAX * NNEI, tl), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((KMAX * 3, tl), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
            jax.ShapeDtypeStruct((KMAX, Lp), jnp.int32),
            jax.ShapeDtypeStruct((KMAX * NNEI, Lp), jnp.float32),
            jax.ShapeDtypeStruct((KMAX * 3, Lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tl), jnp.int32),
            pltpu.VMEM((KMAX, tl), jnp.int32),
            pltpu.VMEM((KMAX * NNEI, tl), jnp.float32),
            pltpu.VMEM((KMAX * 3, tl), jnp.float32),
        ],
        interpret=interpret,
    )(l_packed, p_packed)

    return (
        count[0, :L],
        slot_idx[:, :L].T,
        slot_d[:, :L].T.reshape(L, KMAX, NNEI),
        slot_r[:, :L].T.reshape(L, KMAX, 3),
    )
