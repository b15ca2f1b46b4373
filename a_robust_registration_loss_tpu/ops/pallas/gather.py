"""MXU one-hot row gather: ``out[b, q, :] = table[b, idx[b, q], :]``.

MEASURED NEGATIVE RESULT at RPM's shape — kept because the design wins in a
different regime. At (B=4, N=1024, C=6, Q=65536) on v5e this kernel runs
4.10 ms vs 2.21 ms for XLA's flat global ``jnp.take`` (the variant RPM's
grouping now uses, models/rpmnet.py:_group_gather): with C=6 the MXU
contraction pads the 128-wide output tile to 6 useful lanes and the
fp32-exact HIGHEST precision triples the passes, so pass granularity — not
FLOPs — bounds it at ~2x an XLA gather. The break-even moves toward this
kernel as C grows (C=128 wastes nothing and amortizes the one-hot build
over 21x more useful work per pass). Correctness (bit-exact fwd, fp32-order
bwd) is pinned by tests/test_pallas.py regardless of which path is hot.

The mechanism — one MXU contraction per tile against a one-hot selector
built in VMEM (never materialized in HBM):

    ohT[n, q] = (idx[q] == n)                        # VPU compare vs iota
    outT[c, q] = sum_n tabT[c, n] * ohT[n, q]        # MXU, exact

Exactness: the one-hot is 0/1 in fp32 and the dot runs at HIGHEST precision
(3-pass fp32), so each output element is an fp32 accumulation of zeros plus
exactly one addend — bit-identical to the XLA gather (same argument as the
intersect kernel's emit_pts gather, ops/pallas/intersect.py:159-189).

Backward is the transposed contraction (a scatter-add ridden on the MXU):
``d_table[b, n, c] = sum_q ohT[n, q] * g[b, q, c]`` accumulated across query
tiles. ``idx`` takes no gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

# queries per tile: one-hot tile is (N, TQ) fp32 = N * 2 KiB of VMEM at
# TQ=512 (2 MiB at N=1024), well under the ~16 MiB budget with double
# buffering of the idx/out blocks
_TQ = 512


def _fwd_kernel(idx_ref, tabT_ref, outT_ref, *, n_rows):
    # idx_ref: (B, TQ) i32 (all batch rows — Mosaic needs sublane % 8 == 0 or
    # the full dim, and B is small); tabT_ref: (1, C, N); outT_ref: (1, C, TQ)
    idx = idx_ref[pl.ds(pl.program_id(0), 1), :]  # (1, TQ)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, idx.shape[1]), 0)
    ohT = (row == idx).astype(jnp.float32)  # (N, TQ), broadcast over rows
    outT_ref[0] = jnp.dot(tabT_ref[0], ohT,
                          preferred_element_type=jnp.float32,
                          precision=_HI)


def _bwd_kernel(idx_ref, gT_ref, dtabT_ref, acc, *, n_rows):
    # idx_ref: (B, TQ); gT_ref: (1, C, TQ); dtabT_ref: (1, C, N)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    idx = idx_ref[pl.ds(pl.program_id(0), 1), :]  # (1, TQ)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, idx.shape[1]), 0)
    ohT = (row == idx).astype(jnp.float32)  # (N, TQ)
    # (C, TQ) x (N, TQ) contracting TQ -> (C, N)
    acc[...] += jax.lax.dot_general(
        gT_ref[0], ohT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)

    @pl.when(q == pl.num_programs(1) - 1)
    def _emit():
        dtabT_ref[0] = acc[0]


def _pad_q(idx):
    B, Q = idx.shape
    pad = (-Q) % _TQ
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return idx, Q


def _gather_fwd_impl(table, idx, interpret):
    B, N, C = table.shape
    idx_p, Q = _pad_q(idx)
    Qp = idx_p.shape[1]
    tabT = jnp.swapaxes(table, 1, 2)  # (B, C, N)
    outT = pl.pallas_call(
        functools.partial(_fwd_kernel, n_rows=N),
        grid=(B, Qp // _TQ),
        in_specs=[
            pl.BlockSpec((B, _TQ), lambda b, q: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, _TQ), lambda b, q: (b, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Qp), jnp.float32),
        interpret=interpret,
    )(idx_p, tabT)
    return jnp.swapaxes(outT[:, :, :Q], 1, 2)  # (B, Q, C)


def _gather_bwd_impl(idx, g, N, interpret):
    B, Q, C = g.shape
    idx_p, _ = _pad_q(idx)
    Qp = idx_p.shape[1]
    gT = jnp.swapaxes(g, 1, 2)  # (B, C, Q)
    if Qp != Q:
        gT = jnp.pad(gT, ((0, 0), (0, 0), (0, Qp - Q)))
    dtabT = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rows=N),
        grid=(B, Qp // _TQ),
        in_specs=[
            pl.BlockSpec((B, _TQ), lambda b, q: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, _TQ), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C, N), jnp.float32)],
        interpret=interpret,
    )(idx_p, gT)
    return jnp.swapaxes(dtabT, 1, 2)  # (B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table, idx, interpret=False):
    """``table[b, idx[b, q], :]`` as an MXU one-hot contraction.

    table: (B, N, C) float32; idx: (B, Q) int32 in [0, N). Returns
    (B, Q, C) float32, bit-identical to
    ``jnp.take_along_axis(table, idx[..., None], axis=1)``.
    """
    return _gather_fwd_impl(table, idx, interpret)


def _vjp_fwd(table, idx, interpret):
    return _gather_fwd_impl(table, idx, interpret), (idx, table.shape[1])


def _vjp_bwd(interpret, res, g):
    idx, N = res
    return _gather_bwd_impl(idx, g, N, interpret), None


gather_rows.defvjp(_vjp_fwd, _vjp_bwd)
