"""The correspondence-free intersected-line robust registration metric.

TPU-native re-design of the reference's core product (code/loss.py:68-232).
The reference selects lines with exactly (k, j) intersections via
``.nonzero()`` — data-dependent shapes that cannot compile under XLA and
host-sync under torch. Here the whole metric is **fixed-shape**:

- Stage 1 finds, per line, the intersected surface neighborhoods and packs
  the first ``kmax`` of them into static slot buffers (count, neighborhood
  index, detached barycentric-like weights). Within a (k, j) class the
  reference's selection order only permutes rows/columns of the distance map,
  and every downstream reduction (median, bidirectional min-mean) is
  permutation-invariant, so slot order does not affect the value.
- Stage 2 computes the (L, kmax, kmax) slot-pair distance maps with validity
  masks, the **exact** masked lower-median (reference: torch.median semantics,
  loss.py:223-224), the Welsch-robustified bidirectional min-means with the
  reference's per-combo normalization, the cardinality weights
  exp(-0.5|k-j|) (loss.py:215-216) and the final division by the number of
  nonempty (k, j) combos (the reference's ``loss/(i+1)`` with the leaked loop
  variable, loss.py:230 — B=1 contract, replicated faithfully).

Faithful quirks (see SURVEY.md §7 quirks ledger):
- ``welsch(x, c) = 1 - exp(-(x/c)/2)`` with *squared* distance x and no
  squaring of x/c (loss.py:20-21) — not the textbook Welsch.
- The +2e-4 inside the point-line distance sqrt (loss.py:88).
- The local-adaptive threshold delta = mean pairwise neighbor spacing, and
  the intersection predicate d_i < delta * 1.731 / 2 for all nnei neighbors
  (loss.py:93-110).
- Intersection points are the *mean* over nnei of w_i * p_i — a 1/3-scaled
  weighted combination (loss.py:155-163); both clouds identically scaled.
- Weights are detached (loss.py:92,112); the median is detached
  (loss.py:223-224).
- If the masked median is exactly 0 (possible when slot points coincide,
  e.g. duplicated neighborhoods), welsch(0, 0) = 0/0 = NaN and the loss is
  NaN while valid stays True — exactly what the reference's Welsch1 does
  with torch.median == 0. Faithfully replicated, silently; callers that
  need a hard guard should check jnp.isfinite(loss) alongside valid.

Knowing divergences: NaN in stage 1 raises no process exit (the reference
calls exit(0), loss.py:89-91); the no-intersection case returns
(loss=0, valid=False) instead of the reference's broken (None, None, None)
sentinel (loss.py:232).

Differentiability: only the slot reconstruction (gather + detached-weighted
sum) and stage 2 carry gradients, exactly matching the reference's autograd
graph. Stage-1 label/weight computation is wrapped in stop_gradient, so its
cost is forward-only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.ops import geometry as G

# fp32-exact matmuls: TPU's default matmul precision is bfloat16, which
# silently truncates the rigid transforms (p @ R) on the metric path to
# ~1e-3 accuracy — caught by bench.py's on-hardware pallas gate (the two
# backends transformed in different places and disagreed at 2e-3). The
# whole geometry/metric path pins HIGHEST (se3/ and ops/geometry.py already
# do); the NN model forwards keep the standard default.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def welsch(x, c):
    """Robust kernel 1 - exp(-(x/c)/2) — the reference's exact (non-textbook)
    form: x is a squared distance and x/c is not squared again
    (reference: loss.py:20-21)."""
    return 1.0 - jnp.exp(-(x / c) / 2.0)


NNEI_DEFAULT = 3


class Intersections(NamedTuple):
    """Fixed-shape per-line intersection record (stage-1 output).

    count:    (L,) int32 — number of intersected neighborhoods (uncapped).
    slot_idx: (L, kmax) int32 — indices of the first kmax intersected
              neighborhoods in ascending order; F (out of range) where the
              slot is empty.
    slot_w:   (L, kmax, nnei) — detached per-neighbor weights d_i / sum(d)
              (reference: loss.py:92) for each filled slot; 0 where empty.
    """

    count: jax.Array
    slot_idx: jax.Array
    slot_w: jax.Array


def _stage1_chunk(P, delta, lines_chunk, kmax: int):
    """Intersections of one chunk of lines against all neighborhoods.

    P: (F, nnei, 3) neighborhoods, delta: (F,) adaptive thresholds,
    lines_chunk: (C, 6) [dir | x0]. Returns Intersections for the chunk.
    Everything here is detached (stage 1 carries no gradient by design).
    """
    F = P.shape[0]
    dirs = lines_chunk[:, None, None, :3]  # (C, 1, 1, 3)
    x0 = lines_chunk[:, None, None, 3:]
    AC = P[None] - x0  # (C, F, nnei, 3)
    proj = jnp.sum(AC * dirs, -1) ** 2
    d_ac = jnp.sum(AC * AC, -1)
    d = jnp.sqrt(d_ac - proj + 2e-4)  # (C, F, nnei); +2e-4 per loss.py:88
    label = jnp.all(d < delta[None, :, None] * (1.731 / 2.0), axis=-1)  # (C, F)
    count = jnp.sum(label, axis=-1).astype(jnp.int32)

    # first-kmax slot extraction: score = F - face_index for intersected
    # neighborhoods, 0 otherwise; top-k scores = smallest intersected indices.
    face_rank = jnp.arange(F, dtype=jnp.int32)
    score = jnp.where(label, F - face_rank[None, :], 0)
    top, _ = jax.lax.top_k(score, kmax)  # (C, kmax), descending
    slot_idx = jnp.where(top > 0, F - top, F).astype(jnp.int32)

    # detached weights for the selected neighborhoods
    d_sel = jnp.take_along_axis(d, jnp.minimum(slot_idx, F - 1)[..., None], axis=1)
    w = d_sel / jnp.sum(d_sel, -1, keepdims=True)
    w = jnp.where((slot_idx < F)[..., None], w, 0.0)
    return Intersections(count, slot_idx, w)


def _pallas_outputs_to_inter(point_neis, outputs, lines=None):
    """(count, slot_idx, slot_d2 | None, slot_recon | None, slot_pts | None)
    from the kernel -> (Intersections, recon | None).

    Weights come from the kernel's raw distances when emitted (emit_d2);
    with emit_pts + ``lines`` they are instead recomputed from the EXACT
    gathered slot coordinates — the same point-line distance formula on the
    same fp32 inputs, on only (L, kmax, nnei) values instead of 3 per-slot
    dense reduces inside the kernel. The weighted reconstruction
    sum_i w_i p_i is then formed here on the <= kmax selected slots."""
    count, slot_idx, slot_d2, slot_recon, slot_pts = outputs
    F = point_neis.shape[0]
    filled = slot_idx < F
    slot_idx = jnp.where(filled, slot_idx, F).astype(jnp.int32)
    if slot_d2 is None and slot_pts is not None and lines is not None:
        # d_perp^2 recomputed from the gathered coordinates (detached):
        # same per-component accumulation order as the kernel
        lines = jax.lax.stop_gradient(lines)
        dirs = lines[:, None, None, 0:3]
        x0 = lines[:, None, None, 3:6]
        diff = slot_pts - x0                     # (L, kmax, nnei, 3)
        d_ac = jnp.sum(diff * diff, axis=-1)
        proj = jnp.sum(diff * dirs, axis=-1)
        slot_d2 = d_ac - proj * proj
    if slot_d2 is not None:
        d = jnp.sqrt(jnp.maximum(slot_d2 + 2e-4, 0.0))  # loss.py:88
        w = d / jnp.sum(d, -1, keepdims=True)
        w = jnp.where(filled[..., None], w, 0.0)
    else:
        w = jnp.zeros(slot_idx.shape + (point_neis.shape[1] // 3,),
                      point_neis.dtype)
    recon = None
    if slot_recon is not None:
        recon = jnp.where(filled[..., None], slot_recon, 0.0)
    elif slot_pts is not None:
        recon = jnp.sum(w[..., None] * slot_pts, axis=-2)  # (L, kmax, 3)
    return Intersections(count, slot_idx, w), recon


def _find_intersections_pallas(point_neis, lines, kmax: int,
                               interpret: bool, emit_recon: bool = True):
    """Pallas stage 1 -> (Intersections, slot reconstruction (L, kmax, 3)
    = sum_i w_i p_i, emitted in-kernel — or None when emit_recon=False).
    When the reconstruction is not needed (the generic gather paths) the
    kernel also skips its dense per-(face, line) weight math — measured
    ~0.4 ms per cloud at L=20k on TPU."""
    from a_robust_registration_loss_tpu.ops.pallas import intersect as PK

    delta = neighborhood_delta(jax.lax.stop_gradient(point_neis))
    outputs = PK.intersect_stage1(point_neis, lines, delta, kmax=kmax,
                                  emit_recon=emit_recon,
                                  interpret=interpret)
    return _pallas_outputs_to_inter(point_neis, outputs)


def _find_intersections_pallas_pair(point_neis1, point_neis2, lines,
                                    kmax: int, interpret: bool,
                                    emit_recon: bool):
    """Both clouds' stage 1 in ONE kernel dispatch (the common case: every
    metric evaluation needs both sides against the same lines).

    Mode selection:
    - emit_recon=False (the gather paths, which only need weights):
      d2-only pair — one dispatch instead of two.
    - emit_recon=True (the rigid fast path): the kernel emits raw distances
      AND the exact per-slot gathered coordinates (emit_pts — one MXU
      matmul per slot, round-3 kernel), and the weighted reconstruction is
      formed outside on the <= kmax slots. This replaced the round-2
      in-kernel dense reconstruction (emit_recon), which paid the
      per-(face, line) sqrt/divide weight math on the whole tile; it also
      makes the pallas recon arithmetically identical to the XLA glue
      (exact gathers + the same slot-level weight ops).
    """
    from a_robust_registration_loss_tpu.ops.pallas import intersect as PK

    d1 = neighborhood_delta(jax.lax.stop_gradient(point_neis1))
    d2 = neighborhood_delta(jax.lax.stop_gradient(point_neis2))
    out1, out2 = PK.intersect_stage1_pair(point_neis1, point_neis2, lines,
                                          d1, d2, kmax=kmax,
                                          emit_d2=not emit_recon,
                                          emit_recon=False,
                                          emit_pts=emit_recon,
                                          interpret=interpret)
    glue_lines = lines if emit_recon else None
    return (_pallas_outputs_to_inter(point_neis1, out1, glue_lines),
            _pallas_outputs_to_inter(point_neis2, out2, glue_lines))


def neighborhood_delta(point_neis):
    """Locally adaptive threshold: mean pairwise spacing of each
    neighborhood (reference: loss.py:94-104, nnei=3 there — its only
    value). point_neis: (F, nnei*3) -> (F,). General nnei takes the mean
    over all nnei*(nnei-1)/2 pairwise distances; the nnei=3 branch keeps
    the reference's exact 3-term summation order for golden bit-parity."""
    nnei = point_neis.shape[1] // 3
    if nnei == 3:
        p0, p1, p2 = point_neis[:, 0:3], point_neis[:, 3:6], point_neis[:, 6:9]
        d01 = jnp.linalg.norm(p1 - p0, axis=-1)
        d02 = jnp.linalg.norm(p2 - p0, axis=-1)
        d12 = jnp.linalg.norm(p1 - p2, axis=-1)
        return (d01 + d02 + d12) / 3.0
    P = point_neis.reshape(point_neis.shape[0], nnei, 3)
    d = jnp.linalg.norm(P[:, :, None, :] - P[:, None, :, :], axis=-1)
    iu, ju = jnp.triu_indices(nnei, k=1)
    return jnp.mean(d[:, iu, ju], axis=-1)


def find_intersections(point_neis, lines, kmax: int = 4,
                       line_chunk: Optional[int] = None,
                       backend: str = "xla",
                       interpret: bool = False) -> Intersections:
    """Stage 1 of the metric (reference: loss.py:68-112) for one sample.

    point_neis: (F, nnei*3) flattened neighborhoods; lines: (L, 6).
    ``line_chunk`` bounds the O(chunk * F * nnei) working set (the reference
    materializes the full O(L*F*nnei) tensor, which is why it needs >=15 GB,
    README.md:8); chunking keeps peak memory flat with identical results.

    ``backend="pallas"`` uses the fused TPU kernel
    (ops/pallas/intersect.py): one VMEM-streamed pass, nothing O(L*F) in HBM.
    ``interpret`` runs that kernel in interpreter mode (CPU tests).
    """
    if backend == "pallas":
        inter, _ = _find_intersections_pallas(point_neis, lines, kmax,
                                              interpret, emit_recon=False)
        return inter

    point_neis = jax.lax.stop_gradient(point_neis)
    lines = jax.lax.stop_gradient(lines)
    F = point_neis.shape[0]
    L = lines.shape[0]
    P = point_neis.reshape(F, -1, 3)
    delta = neighborhood_delta(point_neis)

    if line_chunk is None or line_chunk >= L:
        return _stage1_chunk(P, delta, lines, kmax)

    if L % line_chunk != 0:
        pad = line_chunk - L % line_chunk
        # padded lines at the +inf point intersect nothing
        far = jnp.concatenate(
            [jnp.ones((pad, 3), lines.dtype),
         jnp.full((pad, 3), 1e6, lines.dtype)], axis=-1)
        lines_p = jnp.concatenate([lines, far], 0)
    else:
        pad = 0
        lines_p = lines
    chunks = lines_p.reshape(-1, line_chunk, 6)
    out = jax.lax.map(lambda c: _stage1_chunk(P, delta, c, kmax), chunks)
    res = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)
    if pad:
        res = jax.tree.map(lambda x: x[:L], res)
    return res


def reconstruct_intersection_points(point_neis, inter: Intersections):
    """Differentiable slot points: mean over nnei of w_i * p_i — the
    reference's 1/3-scaled weighted combination (loss.py:155-163).

    point_neis: (F, nnei*3) (gradients flow through it); returns (L, kmax, 3).
    Empty slots produce zeros (masked out downstream).
    """
    F = point_neis.shape[0]
    P = point_neis.reshape(F, -1, 3)  # (F, nnei, 3)
    idx = jnp.minimum(inter.slot_idx, F - 1)  # (L, kmax)
    P_sel = P[idx]  # (L, kmax, nnei, 3)
    w = jax.lax.stop_gradient(inter.slot_w)[..., None]  # (L, kmax, nnei, 1)
    pts = jnp.mean(w * P_sel, axis=-2)  # mean over nnei == (1/nnei) * sum
    return jnp.where((inter.slot_idx < F)[..., None], pts, 0.0)


def reconstruct_intersection_points_via(point_neis, inter: Intersections,
                                        apply_fn):
    """Gather-then-transform reconstruction: gather the RAW neighbors into
    slots, then apply the differentiable pointwise map ``apply_fn``
    ((..., 3) -> (..., 3), e.g. p @ R + t) to the gathered points.

    Mathematically identical to transforming the whole neighbor array first
    (the gather commutes with any pointwise map), but the backward pass
    becomes a reduction over the (L, kmax, nnei) gathered points into the
    transform's few parameters instead of a scatter-add into the full
    (F, nnei) neighbor array — on TPU that scatter is the single most
    expensive op of the training step (XLA serializes scatter-adds; measured
    3.8 ms of a 10.5 ms step at L=20k, F=2048)."""
    F = point_neis.shape[0]
    P = jax.lax.stop_gradient(point_neis).reshape(F, -1, 3)
    idx = jnp.minimum(inter.slot_idx, F - 1)
    P_sel = apply_fn(P[idx])  # (L, kmax, nnei, 3), grads only via apply_fn
    w = jax.lax.stop_gradient(inter.slot_w)[..., None]
    pts = jnp.mean(w * P_sel, axis=-2)
    return jnp.where((inter.slot_idx < F)[..., None], pts, 0.0)


@jax.custom_vjp
def _slot_points_kernel(point_neis, kernel_pts, slot_idx, slot_w):
    """Slot points whose VALUE is the kernel-gathered reconstruction and
    whose GRADIENT w.r.t. ``point_neis`` is exactly the gather path's
    (reconstruct_intersection_points): w/nnei scatter-added into the
    selected rows. The pallas stage-1 kernel already gathers the slot
    coordinates exactly (emit_pts: one fp32-HIGHEST MXU matmul per slot),
    so recomputing them with an XLA random-access row gather in the forward
    pass (~1.6 ms at L=20k on TPU) is pure overhead — this moves that
    gather's cost entirely into the backward scatter that autodiff pays
    anyway.

    point_neis: (F, nnei*3); kernel_pts: (L, kmax, 3) — the masked weighted
    mean sum_i w_i p_i / nnei from the kernel's gathered coordinates;
    slot_idx/slot_w: the (detached) Intersections fields. Gradients flow
    ONLY through point_neis (weights/labels are detached in the reference:
    loss.py:92,107-112)."""
    return kernel_pts


def _slot_points_kernel_fwd(point_neis, kernel_pts, slot_idx, slot_w):
    return kernel_pts, (point_neis, slot_idx, slot_w)


def _slot_points_kernel_bwd(res, cot):
    point_neis, slot_idx, slot_w = res
    F = point_neis.shape[0]
    nnei = point_neis.shape[1] // 3
    filled = slot_idx < F
    # (L, kmax, nnei, 3) contributions: w_i/nnei * cotangent, zero on empty
    contrib = jnp.where(filled[..., None, None],
                        slot_w[..., None] * cot[..., None, :], 0.0) / nnei
    idx = jnp.minimum(slot_idx, F - 1)
    gP = jnp.zeros((F, nnei, 3), cot.dtype).at[idx].add(contrib)
    return (gP.reshape(point_neis.shape), jnp.zeros_like(cot),
            None, jnp.zeros_like(slot_w))


_slot_points_kernel.defvjp(_slot_points_kernel_fwd, _slot_points_kernel_bwd)


def intersection_loss_transformed(apply_fn, point_neis1, point_neis2, lines,
                                  kmin: int = 1, kmax: int = 4,
                                  line_chunk: Optional[int] = None,
                                  backend: str = "xla",
                                  interpret: bool = False):
    """The whole metric where cloud 1 is ``apply_fn(point_neis1)`` — the
    registration-training pattern (the predicted transform applied to the
    source neighborhoods, e.g. loss.py:455-463, dcp/Train_DCP.py:262-265).

    Same value and gradient as
    ``intersection_loss(apply_fn(point_neis1), point_neis2, lines)`` (tested
    in tests/test_metric.py), but with the gather-then-transform backward
    (see reconstruct_intersection_points_via)."""
    neis1_t = jax.lax.stop_gradient(
        apply_fn(point_neis1.reshape(-1, 3)).reshape(point_neis1.shape)
    )
    if backend == "pallas":
        (inter1, _), (inter2, recon2) = _find_intersections_pallas_pair(
            neis1_t, point_neis2, lines, kmax, interpret,
            emit_recon=True)
        # cloud 2's slot points come straight from the kernel's exact
        # gather (gradient via _slot_points_kernel's scatter); cloud 1's
        # must still gather the RAW neighborhoods so apply_fn is traced on
        # them (the kernel only ever sees the already-transformed cloud).
        nnei = point_neis2.shape[1] // 3
        pts2 = _slot_points_kernel(point_neis2, recon2 / nnei,
                                   inter2.slot_idx, inter2.slot_w)
    else:
        inter1 = find_intersections(neis1_t, lines, kmax, line_chunk, backend,
                                    interpret)
        inter2 = find_intersections(point_neis2, lines, kmax, line_chunk,
                                    backend, interpret)
        pts2 = reconstruct_intersection_points(point_neis2, inter2)
    pts1 = reconstruct_intersection_points_via(point_neis1, inter1, apply_fn)
    return intersection_loss_from_slots(pts1, inter1, pts2, inter2, kmin, kmax)


def intersection_loss_rigid(R, t, point_neis1, point_neis2, lines,
                            kmin: int = 1, kmax: int = 4,
                            line_chunk: Optional[int] = None,
                            backend: str = "xla", interpret: bool = False):
    """The metric with cloud 1 rigidly transformed: p' = p @ R + t
    (row convention). Same value/grad as intersection_loss_transformed with
    ``lambda p: p @ R + t`` (tested), with one extra algebraic shortcut on
    the pallas backend: the slot weights sum to 1, so the weighted-mean
    reconstruction commutes with the rigid map —
    mean_i(w_i (p_i @ R + t)) = (sum_i w_i p_i) @ R / nnei + t / nnei —
    and the kernel-emitted raw reconstruction feeds one tiny affine op,
    skipping the XLA slot gather entirely (its random-access row gather
    costs ~1.6 ms at L=20k on TPU)."""
    if backend != "pallas":
        return intersection_loss_transformed(
            lambda p: _mm(p, R) + t, point_neis1, point_neis2, lines,
            kmin, kmax, line_chunk, backend, interpret)
    return _intersection_loss_rigid_lanemajor(
        R, t, point_neis1, point_neis2, lines, kmin, kmax, interpret)


def _intersection_loss_rigid_lanemajor(R, t, point_neis1, point_neis2,
                                       lines, kmin: int, kmax: int,
                                       interpret: bool):
    """The rigid pallas path, entirely LANE-MAJOR: the kernel's raw
    (rows, lanes) outputs feed row-wise slot math with no (L, ...)
    transposes anywhere (the `_unpack` relayouts of pts/idx cost ~0.2 ms at
    L=20k). Semantics are identical to
    intersection_loss_from_slots(reconstruct(...)) — same weights (from
    distances recomputed against the packed lines), the same exact masked
    lower-median, per-combo normalization, exp(-0.5|k-j|) weights and
    nonempty-combo division; only the reduction layout differs.

    NOTE stage 1 sees the ALREADY-transformed cloud 1 (detached), so the
    reconstruction is un-transformed with the detached (R, t) and re-applied
    with the traced ones — the only place gradients enter, exactly like the
    reference's autograd graph through the gathered points
    (loss.py:155-163, 455-463)."""
    pts1, pts2, c1, c2 = _rigid_slots_lanemajor(
        R, t, point_neis1, point_neis2, lines, kmax, interpret)
    return _stage2_lanemajor(pts1, pts2, c1, c2, kmin, kmax)


def _rigid_slots_lanemajor(R, t, point_neis1, point_neis2, lines, kmax: int,
                           interpret: bool):
    """Stage 1 + slot reconstruction for the rigid lane-major path:
    (pts1 (kmax*3, Lp), pts2 (kmax*3, Lp), c1 (Lp,), c2 (Lp,)). Per-line
    local — safe to run on a line SHARD (the sp-parallel path shard_maps
    this and all_gathers the outputs before _stage2_lanemajor)."""
    from a_robust_registration_loss_tpu.ops.pallas import intersect as PK

    nnei = point_neis1.shape[1] // 3
    neis1_t = jax.lax.stop_gradient(
        (_mm(point_neis1.reshape(-1, 3), R) + t).reshape(point_neis1.shape)
    )
    d1 = neighborhood_delta(neis1_t)
    d2v = neighborhood_delta(jax.lax.stop_gradient(point_neis2))
    count2, _idx2, pts2L, ll, Lp = PK.intersect_stage1_pair_lanemajor(
        neis1_t, point_neis2, lines, d1, d2v, kmax=kmax, interpret=interpret)

    c1 = count2[0, :Lp]
    c2 = count2[0, Lp:]

    dirs, x0 = ll[0:3, :], ll[3:6, :]  # (3, Lp) each

    def recon_rows(P, cnt):
        """(kmax*3*nnei, Lp) gathered slot coords -> (kmax*3, Lp) weighted
        reconstruction sum_i w_i p_i, masked to 0 on empty slots. Same
        arithmetic as _pallas_outputs_to_inter's emit_pts branch."""
        rows = []
        for s in range(kmax):
            d = []
            for i in range(nnei):
                d_ac = jnp.zeros_like(x0[0])
                proj = jnp.zeros_like(x0[0])
                for c in range(3):
                    diff = P[(s * nnei + i) * 3 + c] - x0[c]
                    d_ac = d_ac + diff * diff
                    proj = proj + diff * dirs[c]
                d.append(jnp.sqrt(jnp.maximum(d_ac - proj * proj + 2e-4,
                                              0.0)))
            dsum = sum(d)
            w = [d[i] / dsum for i in range(nnei)]
            filled = s < jnp.minimum(cnt, kmax)
            for c in range(3):
                acc = jnp.zeros_like(x0[0])
                for i in range(nnei):
                    acc = acc + w[i] * P[(s * nnei + i) * 3 + c]
                rows.append(jnp.where(filled, acc, 0.0))
        return rows  # list of kmax*3 (Lp,) rows

    r1 = recon_rows(pts2L[:, :Lp], c1)   # transformed-cloud coords, detached
    r2 = recon_rows(pts2L[:, Lp:], c2)

    Rd = jax.lax.stop_gradient(R)
    td = jax.lax.stop_gradient(t)
    pts1, pts2 = [], []
    for s in range(kmax):
        v = [r1[s * 3 + c] for c in range(3)]
        raw = [sum((v[k] - td[k]) * Rd[c, k] for k in range(3))
               for c in range(3)]                      # (v - t) @ R^T
        filled1 = s < jnp.minimum(c1, kmax)
        for c in range(3):
            fwd = sum(raw[k] * R[k, c] for k in range(3)) + t[c]  # raw @ R + t
            pts1.append(jnp.where(filled1, fwd / nnei, 0.0))
        filled2 = s < jnp.minimum(c2, kmax)
        for c in range(3):
            pts2.append(jnp.where(filled2, r2[s * 3 + c] / nnei, 0.0))

    return jnp.stack(pts1), jnp.stack(pts2), c1, c2


def _stage2_lanemajor(pts1, pts2, c1, c2, kmin: int, kmax: int):
    """Stage 2, row-wise, from lane-major slot points (kmax*3, Lp) and
    per-line counts (reference: loss.py:115-232; see
    intersection_loss_from_slots for the reference mapping).

    Per-line padded lanes (count 0) stay invalid since kmin >= 1."""
    lvalid = (c1 >= kmin) & (c1 <= kmax) & (c2 >= kmin) & (c2 <= kmax)
    # stage 2, row-wise (reference: loss.py:115-232; see
    # intersection_loss_from_slots for the reference mapping)
    slot_ok1 = [(s < jnp.minimum(c1, kmax)) & lvalid for s in range(kmax)]
    slot_ok2 = [(s < jnp.minimum(c2, kmax)) & lvalid for s in range(kmax)]
    D, pair_ok = [], []
    for s1 in range(kmax):
        for s2 in range(kmax):
            acc = jnp.zeros_like(pts1[0])
            for c in range(3):
                diff = pts1[s1 * 3 + c] - pts2[s2 * 3 + c]
                acc = acc + diff * diff
            D.append(acc)
            pair_ok.append(slot_ok1[s1] & slot_ok2[s2])
    D_all = jnp.stack(D)             # (kmax*kmax, Lp)
    ok_all = jnp.stack(pair_ok)
    median = jax.lax.stop_gradient(_masked_lower_median(D_all, ok_all))

    big = jnp.asarray(jnp.inf, D_all.dtype)
    rowmin = [jnp.min(jnp.stack(
        [jnp.where(slot_ok2[s2], D[s1 * kmax + s2], big)
         for s2 in range(kmax)]), axis=0) for s1 in range(kmax)]
    colmin = [jnp.min(jnp.stack(
        [jnp.where(slot_ok1[s1], D[s1 * kmax + s2], big)
         for s1 in range(kmax)]), axis=0) for s2 in range(kmax)]

    nC = kmax - kmin + 1
    cid = jnp.where(lvalid, (c1 - kmin) * nC + (c2 - kmin), nC * nC)
    # per-combo line counts as nC^2 masked reductions instead of a
    # scatter-add histogram: TPU scatters serialize (and batch-scatter under
    # vmap); the compare+sum is a handful of fused vector passes. The
    # back-gather n_combo[cid] becomes a one-hot contraction for the same
    # reason. Semantics identical (invalid lines carry cid == nC*nC, matched
    # by no bucket).
    ids = jnp.arange(nC * nC, dtype=cid.dtype)
    onehot = (cid[None, :] == ids[:, None])          # (nC*nC, Lp)
    n_combo = jnp.sum(onehot, axis=1, dtype=jnp.int32)
    n_nonempty = jnp.sum(n_combo > 0)
    n_line = jnp.where(lvalid, jnp.sum(onehot * n_combo[:, None], axis=0), 1)

    c1f = jnp.maximum(c1, 1).astype(D_all.dtype)
    c2f = jnp.maximum(c2, 1).astype(D_all.dtype)
    row_sum = sum(jnp.where(slot_ok1[s], welsch(rowmin[s], median), 0.0)
                  for s in range(kmax))
    col_sum = sum(jnp.where(slot_ok2[s], welsch(colmin[s], median), 0.0)
                  for s in range(kmax))
    row_term = row_sum / (n_line * c1f)
    col_term = col_sum / (n_line * c2f)
    w_line = jnp.exp(-0.5 * jnp.abs(c1 - c2).astype(D_all.dtype))
    per_line = jnp.where(lvalid, w_line * (row_term + col_term), 0.0)
    loss = jnp.sum(per_line) / jnp.maximum(n_nonempty, 1).astype(D_all.dtype)
    return loss, n_nonempty > 0


def _masked_lower_median(values, mask):
    """torch.median semantics on a masked flat set: the (n-1)//2-th order
    statistic of the valid entries (lower middle for even n).

    One fused UNSTABLE sort of the 16L-element masked buffer (0.17 ms at
    L=20k on TPU; ``jnp.sort``'s default stable sort costs 0.70 ms, and
    stability cannot change which VALUE sits at rank k — equal keys are
    interchangeable for an order statistic). A 32-step binary search on the
    fp32 bit pattern was tried and is exact but SLOWER (~5 ms): the
    sequential fori_loop serializes 32 reduction passes; an exact 4-pass
    radix select was 2.6 ms (TPU scatter-add histograms) — the single
    fused sort wins."""
    big = jnp.asarray(jnp.inf, values.dtype)
    flat = jnp.where(mask, values, big).reshape(-1)
    n = jnp.sum(mask)
    (srt,) = jax.lax.sort((flat,), is_stable=False)
    k = jnp.maximum((n - 1) // 2, 0)
    return srt[k]


def intersection_loss_from_slots(pts1, inter1: Intersections,
                                 pts2, inter2: Intersections,
                                 kmin: int = 1, kmax: int = 4):
    """Stage 2: the robust loss from two fixed-shape intersection sets
    (reference: loss.py:115-232 for the (kmin..kmax)^2 combo loops).

    NOTE a lane-major twin of this function lives in
    ``_intersection_loss_rigid_lanemajor`` (the pallas rigid fast path);
    any semantic change here must be mirrored there — their value/grad
    equality is pinned by tests/test_pallas.py::TestRigidFastPath and
    ::TestRigidLaneMajorVmap.

    Returns (loss, valid) where valid == False corresponds to the reference's
    no-intersection sentinel (loss.py:232).
    """
    K = pts1.shape[1]
    c1, c2 = inter1.count, inter2.count
    lvalid = (c1 >= kmin) & (c1 <= kmax) & (c2 >= kmin) & (c2 <= kmax)  # (L,)
    slot_ok1 = (jnp.arange(K) < jnp.minimum(c1, kmax)[:, None]) & lvalid[:, None]
    slot_ok2 = (jnp.arange(K) < jnp.minimum(c2, kmax)[:, None]) & lvalid[:, None]

    # (L, K, K) pairwise squared distances between slot points
    D = jnp.sum((pts1[:, :, None, :] - pts2[:, None, :, :]) ** 2, axis=-1)
    pair_ok = slot_ok1[:, :, None] & slot_ok2[:, None, :]

    median = jax.lax.stop_gradient(_masked_lower_median(D, pair_ok))

    big = jnp.asarray(jnp.inf, D.dtype)
    rowmin = jnp.min(jnp.where(slot_ok2[:, None, :], D, big), axis=2)  # (L, K)
    colmin = jnp.min(jnp.where(slot_ok1[:, :, None], D, big), axis=1)  # (L, K)

    # per-(k, j)-combo line counts as nC^2 masked reductions (scatter-free;
    # see the identical construction + rationale in _stage2_lanemajor)
    nC = (kmax - kmin + 1)
    cid = jnp.where(lvalid, (c1 - kmin) * nC + (c2 - kmin), nC * nC)
    ids = jnp.arange(nC * nC, dtype=cid.dtype)
    onehot = (cid[None, :] == ids[:, None])          # (nC*nC, L)
    n_combo = jnp.sum(onehot, axis=1, dtype=jnp.int32)
    n_nonempty = jnp.sum(n_combo > 0)
    n_line = jnp.where(lvalid, jnp.sum(onehot * n_combo[:, None], axis=0), 1)

    # welsch is monotone in x, so welsch(min) == min(welsch)
    row_w = jnp.where(slot_ok1, welsch(rowmin, median), 0.0)
    col_w = jnp.where(slot_ok2, welsch(colmin, median), 0.0)
    c1f = jnp.maximum(c1, 1).astype(D.dtype)
    c2f = jnp.maximum(c2, 1).astype(D.dtype)
    row_term = jnp.sum(row_w, axis=1) / (n_line * c1f)
    col_term = jnp.sum(col_w, axis=1) / (n_line * c2f)

    w_line = jnp.exp(-0.5 * jnp.abs(c1 - c2).astype(D.dtype))  # loss.py:215-216
    per_line = jnp.where(lvalid, w_line * (row_term + col_term), 0.0)
    loss = jnp.sum(per_line) / jnp.maximum(n_nonempty, 1).astype(D.dtype)
    return loss, n_nonempty > 0


def intersection_loss(point_neis1, point_neis2, lines, kmin: int = 1,
                      kmax: int = 4, line_chunk: Optional[int] = None,
                      backend: str = "xla", interpret: bool = False):
    """The whole metric for one sample (reference:
    cal_loss_intersection_batch_whole_median_pts_lines, loss.py:170-232,
    with (s_m, s_n, e_m, e_n) == (kmin, kmin, kmax+1, kmax+1); every
    reference call site uses (1, 1, 5, 5)).

    point_neis1/2: (F, nnei*3); lines: (L, 6). Returns (loss, valid).
    The reference function is only correct for batch size 1 (its
    weights_k_j_list is keyed by a leaked loop variable, loss.py:217) and all
    its deep-learning harnesses call it on [j:j+1] slices — batching here is
    ``jax.vmap`` over this function, preserving the per-sample contract.
    """
    if backend == "pallas":
        # emit_pts mode: the kernel gathers the slot coordinates exactly
        # (MXU one-hot matmul); value comes from that reconstruction, and
        # _slot_points_kernel routes the gradient through the same
        # w/nnei-scatter the XLA gather path would produce — the forward
        # row gather disappears entirely.
        (inter1, recon1), (inter2, recon2) = _find_intersections_pallas_pair(
            point_neis1, point_neis2, lines, kmax, interpret,
            emit_recon=True)
        nnei = point_neis1.shape[1] // 3
        pts1 = _slot_points_kernel(point_neis1, recon1 / nnei,
                                   inter1.slot_idx, inter1.slot_w)
        pts2 = _slot_points_kernel(point_neis2, recon2 / nnei,
                                   inter2.slot_idx, inter2.slot_w)
    else:
        inter1 = find_intersections(point_neis1, lines, kmax, line_chunk,
                                    backend, interpret)
        inter2 = find_intersections(point_neis2, lines, kmax, line_chunk,
                                    backend, interpret)
        pts1 = reconstruct_intersection_points(point_neis1, inter1)
        pts2 = reconstruct_intersection_points(point_neis2, inter2)
    return intersection_loss_from_slots(pts1, inter1, pts2, inter2, kmin, kmax)


def intersection_loss_batch(point_neis1, point_neis2, lines, kmin: int = 1,
                            kmax: int = 4, line_chunk: Optional[int] = None,
                            backend: str = "xla", interpret: bool = False):
    """Batched metric: (B, F, 9) x (B, F2, 9) x (B, L, 6) -> ((B,), (B,)).

    Mirrors the harnesses' per-sample loops (e.g. dcp/Train_DCP.py:266-270)
    as a vmap — per-sample medians and normalizations, exactly like B=1 calls.
    """
    return jax.vmap(
        lambda a, b, l: intersection_loss(a, b, l, kmin, kmax, line_chunk,
                                          backend, interpret)
    )(point_neis1, point_neis2, lines)
