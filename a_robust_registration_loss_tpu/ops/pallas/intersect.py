"""Fused Pallas TPU kernel for metric stage 1: line-neighborhood intersection.

Replaces the O(L*F*nnei) materialized tensors of both the torch reference
(code/loss.py:68-112 — the reason for its >=15 GB memory demand,
README.md:8) and the plain-XLA path: streams (line-tile x face-tile) blocks
through VMEM, computing the three point-line distances, the adaptive-
threshold intersection predicate, per-line intersection counts, and packing
the first-kmax intersected neighborhoods (index + raw distances) into fixed
slot buffers — all in one pass with nothing O(L*F) ever written to HBM.

Slot assignment across face tiles uses a running per-line count in VMEM
scratch (persistent across the sequential face-tile grid steps on a TPU
core) plus an in-tile exclusive cumsum to rank each hit; slot s is extracted
with a one-hot masked reduction, so the kernel is fully vectorized — no
scalar loops.

The kernel is forward-only by design: stage 1 is non-differentiable in the
reference too (detached weights, boolean labels — loss.py:92,107-112), and
the differentiable reconstruction happens outside in plain JAX
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


def _cumsum_axis1(x):
    """Inclusive cumsum along axis 1 via Hillis-Steele log-steps (Mosaic has
    no cumsum lowering); O(TF log TF) VPU adds on a (TL, TF) block."""
    TF = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < TF:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(col >= shift, rolled, 0)
        shift *= 2
    return x


def _kernel(lines_ref, p_ref, thr_ref, fvalid_ref,
            count_ref, slot_idx_ref, slot_d_ref,
            cnt_acc, idx_acc, d_acc):
    """Grid: (line_tiles, face_tiles); face tile index j advances fastest, so
    the per-line accumulators in VMEM scratch carry across the F sweep."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    TL = lines_ref.shape[0]
    TF = p_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        cnt_acc[:] = jnp.zeros_like(cnt_acc)
        idx_acc[:] = jnp.full_like(idx_acc, jnp.iinfo(jnp.int32).max)
        d_acc[:] = jnp.zeros_like(d_acc)

    dirs = lines_ref[:, 0:3]  # (TL, 3)
    x0 = lines_ref[:, 3:6]
    thr2 = thr_ref[:, 0]  # (TF,) squared threshold (delta * 1.731/2)^2 - 2e-4

    # d_perp^2(l, f, i) = |p - x0|^2 - ((p - x0) . dir)^2, computed directly
    # (component accumulation) to match the reference's rounding behavior.
    label = jnp.ones((TL, TF), jnp.bool_)
    d2 = []
    for i in range(NNEI):
        d_ac = jnp.zeros((TL, TF), jnp.float32)
        proj = jnp.zeros((TL, TF), jnp.float32)
        for c in range(3):
            diff = p_ref[:, 3 * i + c][None, :] - x0[:, c][:, None]  # (TL, TF)
            d_ac += diff * diff
            proj += diff * dirs[:, c][:, None]
        d2_i = d_ac - proj * proj
        d2.append(d2_i)
        # sqrt(d2 + 2e-4) < thr  <=>  d2 < thr^2 - 2e-4 (precomputed)
        label &= d2_i < thr2[None, :]
    label &= fvalid_ref[:, 0][None, :] != 0  # mask face-tile padding

    hits = label.astype(jnp.int32)
    # rank of each hit among this line's hits in this tile (exclusive cumsum)
    rank = _cumsum_axis1(hits) - hits + cnt_acc[:, 0][:, None]  # (TL, TF)
    face_base = j * TF
    face_ids = face_base + jax.lax.broadcasted_iota(jnp.int32, (TL, TF), 1)

    for s in range(KMAX):
        m = label & (rank == s)  # at most one per line
        mi = m.astype(jnp.int32)
        mf = m.astype(jnp.float32)
        got = jnp.sum(mi, axis=1)  # 0/1
        idx_s = jnp.sum(mi * face_ids, axis=1)
        idx_acc[:, s] = jnp.where(got > 0, idx_s, idx_acc[:, s])
        for i in range(NNEI):
            v = jnp.sum(mf * d2[i], axis=1)
            d_acc[:, s * NNEI + i] = jnp.where(got > 0, v, d_acc[:, s * NNEI + i])

    cnt_acc[:, 0] += jnp.sum(hits, axis=1)

    @pl.when(j == n_j - 1)
    def _emit():
        count_ref[:, 0] = cnt_acc[:, 0]
        slot_idx_ref[:] = idx_acc[:]
        slot_d_ref[:] = d_acc[:]


@functools.partial(jax.jit, static_argnames=("tl", "tf", "interpret"))
def intersect_stage1(point_neis, lines, delta, *, tl: int = 512, tf: int = 512,
                     interpret: bool = False):
    """Fused stage 1. point_neis (F, 9), lines (L, 6), delta (F,) adaptive
    thresholds. Returns (count (L,) int32, slot_idx (L, 4) int32 with
    INT32_MAX for empty, slot_d2 (L, 4, 3) raw perpendicular d^2 values
    *without* the +2e-4, which the caller re-adds under sqrt).
    """
    point_neis = jax.lax.stop_gradient(point_neis)
    lines = jax.lax.stop_gradient(lines)
    F = point_neis.shape[0]
    L = lines.shape[0]
    Fp = _round_up(F, tf)
    Lp = _round_up(L, tl)

    p_pad = jnp.zeros((Fp, 9), jnp.float32).at[:F].set(point_neis)
    fvalid = jnp.zeros((Fp, 1), jnp.int32).at[:F].set(1)
    thr = (delta * (1.731 / 2.0)) ** 2 - 2e-4
    thr_pad = jnp.full((Fp, 1), -jnp.inf, jnp.float32).at[:F, 0].set(thr)
    # padded lines: zero direction, far-away origin -> never intersect
    lines_pad = (
        jnp.zeros((Lp, 6), jnp.float32)
        .at[:, 5].set(1e9)
        .at[:L].set(lines)
    )

    grid = (Lp // tl, Fp // tf)
    count, slot_idx, slot_d = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tl, 6), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, 9), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tl, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, KMAX), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, KMAX * NNEI), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Lp, KMAX), jnp.int32),
            jax.ShapeDtypeStruct((Lp, KMAX * NNEI), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tl, 1), jnp.int32),
            pltpu.VMEM((tl, KMAX), jnp.int32),
            pltpu.VMEM((tl, KMAX * NNEI), jnp.float32),
        ],
        interpret=interpret,
    )(lines_pad, p_pad, thr_pad, fvalid)

    return count[:L, 0], slot_idx[:L], slot_d[:L].reshape(L, KMAX, NNEI)
