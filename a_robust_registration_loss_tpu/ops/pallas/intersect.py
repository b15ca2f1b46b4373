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

Three output modes trim the work to what the consumer actually reads:
``emit_d2`` (raw per-neighbor distances — weights derive from them; 3 VPU
reduces per slot), ``emit_pts`` (the exact gathered neighbor coordinates +
face id per slot as ONE fp32-HIGHEST MXU matmul per slot against the
one-hot slot mask — the rigid fast path consumes d2+pts and reconstructs
outside on the <= kmax slots, byte-matching the XLA glue arithmetic) and
``emit_recon`` (the round-2 in-kernel dense weighted reconstruction —
kept for comparison/tests; pays per-(face, line) sqrt/divide weight math
on the whole tile and measures slower than d2+pts).

``intersect_stage1_pair`` runs BOTH clouds of a registration pair in one
``pallas_call`` (leading cloud grid axis): one dispatch instead of two, and
the line tiles stream through the same pipeline back to back.

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

NNEI = 3   # the reference's only neighborhood size (loss.py:473); the
           # kernel itself is general — nnei is derived from input shapes
KMAX = 4  # default slot capacity (every reference call site uses (1,1,5,5))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(lines_ref, p_ref, *refs, face_axis: int, kmax: int, nnei: int,
            emit_d2: bool, emit_recon: bool, emit_pts: bool):
    """Grid: (..., line_tiles, face_tiles); the face tile index (grid axis
    ``face_axis``, always last) advances fastest, so the per-line
    accumulators in VMEM scratch carry across the F sweep. Any leading grid
    axes (the cloud axis of the paired variant) change slower than the line
    axis, so each (cloud, line-tile) combination gets a full, independent
    F sweep.

    lines_ref: (8, TL)  rows 0-2 = direction, 3-5 = origin (6,7 padding)
    p_ref:     (nrows, TF) rows 0..3*nnei-1 = the nnei neighbors' xyz,
               row 3*nnei = squared threshold (-inf on padded faces encodes
               face validity; rest of the rows are layout padding; nrows =
               3*nnei+1 rounded up to 8 sublanes — 16 at the reference's
               nnei=3)
    outputs (per line tile): count (1, TL), slot_idx (KMAX, TL),
               [slot_d (KMAX*nnei, TL) if emit_d2],
               [slot_r (KMAX*3, TL) if emit_recon],
               [slot_p (KMAX*3*nnei, TL) if emit_pts]
    """
    refs = list(refs)
    count_ref, slot_idx_ref = refs.pop(0), refs.pop(0)
    slot_d_ref = refs.pop(0) if emit_d2 else None
    slot_r_ref = refs.pop(0) if emit_recon else None
    slot_p_ref = refs.pop(0) if emit_pts else None
    cnt_acc, idx_acc = refs.pop(0), refs.pop(0)
    d_acc = refs.pop(0) if emit_d2 else None
    r_acc = refs.pop(0) if emit_recon else None
    p_acc = refs.pop(0) if emit_pts else None

    j = pl.program_id(face_axis)
    n_j = pl.num_programs(face_axis)
    TF = p_ref.shape[1]
    TL = lines_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        cnt_acc[:] = jnp.zeros_like(cnt_acc)
        idx_acc[:] = jnp.zeros_like(idx_acc)
        if emit_d2:
            d_acc[:] = jnp.zeros_like(d_acc)
        if emit_recon:
            r_acc[:] = jnp.zeros_like(r_acc)
        if emit_pts:
            p_acc[:] = jnp.zeros_like(p_acc)

    thr2 = p_ref[3 * nnei, :]  # (TF,) squared threshold (delta*1.731/2)^2 - 2e-4

    # d_perp^2(f, l, i) = |p - x0|^2 - ((p - x0) . dir)^2, accumulated per
    # component to match the reference's direct (un-expanded) rounding.
    label = None
    d2 = []
    for i in range(nnei):
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

    if emit_recon:
        # raw weighted reconstruction wp_c = sum_i (d_i / sum_j d_j) * p_i_c
        # per (face, line) pair — same math as the XLA glue (sqrt of
        # d2 + 2e-4, normalize, weight) with the divide hoisted to one
        # reciprocal (one extra rounding vs the glue, within fp32 tolerance).
        # max(., 0) guards the sqrt against fp-cancellation negatives on
        # padded or far faces (never selected, but NaN * 0 would poison the
        # reductions); exact no-op for the selected faces (d2 + 2e-4 > 0).
        d = [jnp.sqrt(jnp.maximum(d2[i] + 2e-4, 0.0)) for i in range(nnei)]
        dinv = 1.0 / sum(d)
        w = [d[i] * dinv for i in range(nnei)]  # one divide, nnei mults
        wp = []
        for c in range(3):
            acc = jnp.zeros((TF, TL), jnp.float32)
            for i in range(nnei):
                acc += w[i] * p_ref[3 * i + c, :][:, None]
            wp.append(acc)

    hits = label.astype(jnp.float32)  # (TF, TL)
    # inclusive prefix-sum over faces via one MXU matmul with a lower-
    # triangular mask, in bfloat16: 0/1 values are exact in bf16 and the
    # fp32 accumulation of <= TF binary products is exact, at 4x the fp32
    # MXU throughput.
    row = jax.lax.broadcasted_iota(jnp.int32, (TF, TF), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TF, TF), 1)
    tri = (row >= col).astype(jnp.bfloat16)
    csum = jnp.dot(tri, hits.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # (TF, TL)
    rank = csum - hits + cnt_acc[0, :][None, :]  # exclusive rank + carry
    # one-hot slot selector base: rank of hit faces, -1 elsewhere — the
    # per-slot mask is then a single compare instead of hits * |rank-s|<0.5
    rank_sel = jnp.where((label) & (rank < kmax), rank, -1.0)

    if not emit_pts:
        face_ids = (j * TF
                    + jax.lax.broadcasted_iota(jnp.int32, (TF, TL), 0)
                    ).astype(jnp.float32)

    if emit_pts:
        # per-slot gathered coordinates as ONE MXU matmul per slot:
        # out[q, l] = sum_f A[q, f] * m[f, l] with A = [3*nnei neighbor
        # coords; face id] — m is one-hot over f per line, so the product is
        # an EXACT gather (fp32 accumulation of zeros plus one addend), and
        # the contraction rides the MXU instead of 3*nnei+1 VPU reduces per
        # slot.
        f_row = (j * TF
                 + jax.lax.broadcasted_iota(jnp.int32, (1, TF), 1)
                 ).astype(jnp.float32)
        A = jnp.concatenate([p_ref[0:3 * nnei, :], f_row], axis=0)

    # Slot accumulation is pure +=: each (slot, line) receives a nonzero
    # one-hot contribution from at most ONE face across the entire sweep
    # (the rank carries across face tiles), so adding the masked reduces is
    # equivalent to the select-and-hold update, minus the `got` reduce and
    # the where selects. Empty slots accumulate 0; slot_idx's 2**30 empty
    # sentinel is re-applied outside the kernel from `count` (slots fill in
    # rank order, so slot s is occupied iff s < count).
    for s in range(kmax):
        m = (rank_sel == s).astype(jnp.float32)  # one-hot over faces per line
        if emit_pts:
            # HIGHEST precision: the default fp32 matmul runs as bf16 MXU
            # passes and rounds the gathered coordinates (~1e-3) — caught by
            # the on-chip gate; the 3-pass fp32 product keeps the gather
            # exact and is still negligible MXU work next to the rank matmul
            out = jnp.dot(A, m, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # (3*nnei+1, TL)
            for q in range(3 * nnei):
                p_acc[s * 3 * nnei + q, :] += out[q, :]
            idx_acc[s, :] += out[3 * nnei, :].astype(jnp.int32)
        else:
            idx_s = jnp.sum(m * face_ids, axis=0)
            idx_acc[s, :] += idx_s.astype(jnp.int32)
        if emit_d2:
            for i in range(nnei):
                d_acc[s * nnei + i, :] += jnp.sum(m * d2[i], axis=0)
        if emit_recon:
            for c in range(3):
                r_acc[s * 3 + c, :] += jnp.sum(m * wp[c], axis=0)

    cnt_acc[0, :] += jnp.sum(hits, axis=0).astype(jnp.int32)

    @pl.when(j == n_j - 1)
    def _emit():
        count_ref[:] = cnt_acc[:]
        slot_idx_ref[:] = idx_acc[:]
        if emit_d2:
            slot_d_ref[:] = d_acc[:]
        if emit_recon:
            slot_r_ref[:] = r_acc[:]
        if emit_pts:
            slot_p_ref[:] = p_acc[:]


def _face_rows(nnei):
    """Sublane row count of the packed face tensor: 3*nnei coordinate rows
    + 1 threshold row, rounded up to 8 (16 at the reference's nnei=3)."""
    return _round_up(3 * nnei + 1, 8)


def _pack_faces(point_neis, delta, Fp):
    """(F, 3*nnei) neighborhoods + (F,) deltas -> the (nrows, Fp) face
    tensor: rows 0..3*nnei-1 neighbors, row 3*nnei squared threshold (-inf
    on padded faces, which keeps their labels False with no extra mask)."""
    F, w = point_neis.shape
    nnei = w // 3
    thr = (delta * (1.731 / 2.0)) ** 2 - 2e-4
    p_packed = jnp.zeros((_face_rows(nnei), Fp), jnp.float32)
    p_packed = p_packed.at[0:w, :F].set(point_neis.T)
    p_packed = p_packed.at[w, :F].set(thr)
    p_packed = p_packed.at[w, F:].set(-jnp.inf)
    return p_packed


def _pack_lines(lines, Lp):
    """(L, 6) lines -> (8, Lp); padded lines have zero direction and a
    far-away origin, so they never intersect."""
    L = lines.shape[0]
    l_packed = jnp.zeros((8, Lp), jnp.float32)
    l_packed = l_packed.at[5, :].set(1e9)
    l_packed = l_packed.at[0:6, :L].set(lines.T)
    return l_packed


def _specs_and_shapes(n_cloud, tl, tf, Lp, kmax, nnei, emit_d2, emit_recon,
                      emit_pts):
    """(in_specs, out_specs, out_shapes, scratch) for a grid whose last two
    axes are (line_tiles, face_tiles); ``n_cloud`` adds a leading (slowest)
    cloud grid axis (0 = none, i.e. the single-cloud call). The paired
    variant keeps every array 2-D by stacking clouds along the row
    (sublane) axis — the face tensor becomes (n_cloud*nrows, Fp) with block
    row-index c, and each output becomes (n_cloud*rows, Lp) likewise — so
    the kernel body is identical for both entry points."""
    nrows = _face_rows(nnei)
    if n_cloud:
        n_lt = Lp // tl
        line_spec = pl.BlockSpec((8, tl), lambda c, i, j: (0, i),
                                 memory_space=pltpu.VMEM)
        face_spec = pl.BlockSpec((nrows, tf), lambda c, i, j: (c, j),
                                 memory_space=pltpu.VMEM)

        # outputs stack the clouds along the LINE (lane) axis — row-axis
        # stacking would need per-cloud row blocks smaller than 8 sublanes,
        # which the TPU lowering rejects
        def out_spec(rows):
            return pl.BlockSpec((rows, tl),
                                lambda c, i, j, n_lt=n_lt: (0, c * n_lt + i),
                                memory_space=pltpu.VMEM)

        def out_shape(rows, dtype):
            return jax.ShapeDtypeStruct((rows, n_cloud * Lp), dtype)
    else:
        line_spec = pl.BlockSpec((8, tl), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM)
        face_spec = pl.BlockSpec((nrows, tf), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)

        def out_spec(rows):
            return pl.BlockSpec((rows, tl), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)

        def out_shape(rows, dtype):
            return jax.ShapeDtypeStruct((rows, Lp), dtype)

    out_specs = [out_spec(1), out_spec(kmax)]
    out_shapes = [out_shape(1, jnp.int32), out_shape(kmax, jnp.int32)]
    scratch = [pltpu.VMEM((1, tl), jnp.int32), pltpu.VMEM((kmax, tl), jnp.int32)]
    if emit_d2:
        out_specs.append(out_spec(kmax * nnei))
        out_shapes.append(out_shape(kmax * nnei, jnp.float32))
        scratch.append(pltpu.VMEM((kmax * nnei, tl), jnp.float32))
    if emit_recon:
        out_specs.append(out_spec(kmax * 3))
        out_shapes.append(out_shape(kmax * 3, jnp.float32))
        scratch.append(pltpu.VMEM((kmax * 3, tl), jnp.float32))
    if emit_pts:
        out_specs.append(out_spec(kmax * 3 * nnei))
        out_shapes.append(out_shape(kmax * 3 * nnei, jnp.float32))
        scratch.append(pltpu.VMEM((kmax * 3 * nnei, tl), jnp.float32))
    return [line_spec, face_spec], out_specs, out_shapes, scratch


def _unpack(outs, L, kmax, nnei, emit_d2, emit_recon, emit_pts, cloud=None,
            Lp=None):
    """Kernel outputs -> (count (L,), slot_idx (L, KMAX), slot_d2 or None,
    slot_recon or None, slot_pts or None), optionally slicing a cloud of
    the paired call (whose outputs stack the clouds along the line axis)."""
    outs = list(outs)
    lo = 0 if cloud is None else cloud * Lp

    count = outs.pop(0)[0, lo:lo + L]
    # the kernel accumulates slot ids with +=, so empty slots hold 0; slots
    # fill in rank order, so occupancy is exactly s < count — re-apply the
    # 2**30 empty sentinel here
    slot_idx = outs.pop(0)[:, lo:lo + L].T
    slot_idx = jnp.where(
        jnp.arange(kmax)[None, :] < jnp.minimum(count, kmax)[:, None],
        slot_idx, 2**30)
    slot_d2 = None
    slot_recon = None
    slot_pts = None
    if emit_d2:
        slot_d2 = outs.pop(0)[:, lo:lo + L].T.reshape(L, kmax, nnei)
    if emit_recon:
        slot_recon = outs.pop(0)[:, lo:lo + L].T.reshape(L, kmax, 3)
    if emit_pts:
        slot_pts = outs.pop(0)[:, lo:lo + L].T.reshape(L, kmax, nnei, 3)
    return count, slot_idx, slot_d2, slot_recon, slot_pts


@functools.partial(jax.jit, static_argnames=("kmax", "tl", "tf", "emit_d2",
                                             "emit_recon", "emit_pts",
                                             "interpret"))
def intersect_stage1(point_neis, lines, delta, *, kmax: int = KMAX,
                     tl: int = 2048,
                     tf: int = 128, emit_d2: bool = True,
                     emit_recon: bool = True, emit_pts: bool = False,
                     interpret: bool = False):
    """Fused stage 1. point_neis (F, 3*nnei), lines (L, 6), delta (F,)
    adaptive thresholds. Returns (count (L,) int32, slot_idx (L, kmax) int32
    with 2**30 for empty, slot_d2 (L, kmax, nnei) raw perpendicular d^2
    values *without* the +2e-4 which the caller re-adds under sqrt — or None
    when emit_d2=False, slot_recon (L, kmax, 3) — the in-kernel weighted
    reconstruction sum_i w_i p_i per slot — or None when emit_recon=False,
    slot_pts (L, kmax, nnei, 3) — the raw gathered neighbor coordinates per
    slot (lets consumers build weights + reconstruction outside without the
    slow XLA row-gather AND without the kernel's dense per-(face, line)
    weight math) — or None when emit_pts=False)."""
    point_neis = jax.lax.stop_gradient(point_neis)
    lines = jax.lax.stop_gradient(lines)
    F = point_neis.shape[0]
    nnei = point_neis.shape[1] // 3
    L = lines.shape[0]
    Fp = _round_up(F, tf)
    Lp = _round_up(L, tl)

    in_specs, out_specs, out_shapes, scratch = _specs_and_shapes(
        0, tl, tf, Lp, kmax, nnei, emit_d2, emit_recon, emit_pts)
    grid = (Lp // tl, Fp // tf)
    outs = pl.pallas_call(
        functools.partial(_kernel, face_axis=1, kmax=kmax, nnei=nnei,
                          emit_d2=emit_d2,
                          emit_recon=emit_recon, emit_pts=emit_pts),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(_pack_lines(lines, Lp), _pack_faces(point_neis, delta, Fp))
    return _unpack(outs, L, kmax, nnei, emit_d2, emit_recon, emit_pts)


def _pair_call(point_neis1, point_neis2, lines, delta1, delta2, kmax, tl,
               tf, emit_d2, emit_recon, emit_pts, interpret):
    """The shared paired pallas_call: returns (outs, Lp) with the raw
    lane-major outputs (each array stacks the two clouds along the lane
    axis: cloud c occupies lanes [c*Lp, (c+1)*Lp))."""
    point_neis1 = jax.lax.stop_gradient(point_neis1)
    point_neis2 = jax.lax.stop_gradient(point_neis2)
    lines = jax.lax.stop_gradient(lines)
    nnei = point_neis1.shape[1] // 3
    Fp = _round_up(max(point_neis1.shape[0], point_neis2.shape[0]), tf)
    Lp = _round_up(lines.shape[0], tl)

    p = jnp.concatenate([_pack_faces(point_neis1, delta1, Fp),
                         _pack_faces(point_neis2, delta2, Fp)])  # (2*nrows, Fp)

    in_specs, out_specs, out_shapes, scratch = _specs_and_shapes(
        2, tl, tf, Lp, kmax, nnei, emit_d2, emit_recon, emit_pts)
    grid = (2, Lp // tl, Fp // tf)
    outs = pl.pallas_call(
        functools.partial(_kernel, face_axis=2, kmax=kmax, nnei=nnei,
                          emit_d2=emit_d2,
                          emit_recon=emit_recon, emit_pts=emit_pts),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(_pack_lines(lines, Lp), p)
    return outs, Lp


@functools.partial(jax.jit, static_argnames=("kmax", "tl", "tf", "emit_d2",
                                             "emit_recon", "emit_pts",
                                             "interpret"))
def intersect_stage1_pair(point_neis1, point_neis2, lines, delta1, delta2, *,
                          kmax: int = KMAX,
                          tl: int = 2048, tf: int = 128, emit_d2: bool = True,
                          emit_recon: bool = True, emit_pts: bool = False,
                          interpret: bool = False):
    """Stage 1 for BOTH clouds of a registration pair in one pallas_call:
    grid (2, line_tiles, face_tiles) with the cloud on the slowest axis —
    one kernel dispatch, and the second cloud's sweep streams through the
    already-warm pipeline. Clouds of different sizes are padded to a common
    face count (padded faces carry -inf thresholds and never intersect).

    Returns two (count, slot_idx, slot_d2 | None, slot_recon | None,
    slot_pts | None) tuples, bitwise identical to two ``intersect_stage1``
    calls."""
    L = lines.shape[0]
    nnei = point_neis1.shape[1] // 3
    outs, Lp = _pair_call(point_neis1, point_neis2, lines, delta1, delta2,
                          kmax, tl, tf, emit_d2, emit_recon, emit_pts,
                          interpret)
    return (_unpack(outs, L, kmax, nnei, emit_d2, emit_recon, emit_pts,
                    cloud=0, Lp=Lp),
            _unpack(outs, L, kmax, nnei, emit_d2, emit_recon, emit_pts,
                    cloud=1, Lp=Lp))


def intersect_stage1_pair_lanemajor(point_neis1, point_neis2, lines, delta1,
                                    delta2, *, kmax: int = KMAX,
                                    tl: int = 2048, tf: int = 128,
                                    interpret: bool = False):
    """Raw lane-major paired stage 1 in pts mode, for consumers that stay
    lane-major end to end (ops/metric.py's rigid loss): returns
    (count (1, 2*Lp) int32, slot_idx (kmax, 2*Lp) int32 — 0 on empty slots,
    slot_pts (kmax*3*nnei, 2*Lp) f32, packed_lines (8, Lp), Lp) where cloud c
    occupies lanes [c*Lp, (c+1)*Lp). packed_lines is the kernel's own line
    input (rows 0-2 direction, 3-5 origin), shared so the caller pays no
    re-pack."""
    outs, Lp = _pair_call(point_neis1, point_neis2, lines, delta1, delta2,
                          kmax, tl, tf, False, False, True, interpret)
    count, slot_idx, slot_pts = outs
    packed = _pack_lines(jax.lax.stop_gradient(lines), Lp)  # CSEs with input
    return count, slot_idx, slot_pts, packed, Lp
