"""Unsupervised training-loss compositions for the model zoo.

The reference drops the intersected-line metric into three existing networks
as their training loss; these are the exact compositions, jitted and batched:

- DCP   (dcp/Train_DCP.py:233-300, 399-425): 15k lines resampled once per
        batch (radius = 0.5 * target-bbox diagonal), per-sample metric / 5.0
        summed then / batch_size; optional + 0.1 * cycle loss; a battery of
        GT-referenced monitors that are logged, never optimized.
- RPM   (rpm/Train_RPM.py:184-316): 10k lines once per batch (radius = FULL
        bbox diagonal, no 0.5 — Train_RPM.py:203-205), per-iteration metric
        sums each divided by num_iter, outlier regularization
        (1 - sum(perm)) * wt_inliers per iteration, everything discounted
        0.5^(num_iter - ni - 1); total = 10 * reg + 1 * intersection.
- FMR   (fmr/model.py:259-313, 557-560): 15k lines once (radius = 0.5 *
        diagonal, sampled against the LAST IC iterate's transformed source),
        metric on the last 3 IC iterates with 0.5^(maxiter - i - 1)
        discounts, per-sample / 5.0 then / batch_size;
        total = 0.01 * loss_ende + 1.0 * intersection.

Conventions: data dicts follow data/dataset.py (row-vector GT for the plain
contract; DCP adapter pre-transposes to column). Predicted transforms are
column convention: DCP (R_ab, t_ab) with p' = R p + t; RPM (B, 3, 4) rt;
FMR (B, 4, 4) homogeneous.

Divergence from the reference: a sample whose metric has no intersections
contributes 0 to the batch sum under a validity mask (the reference would
crash adding None, loss.py:232 — it never happens in practice because lines
are rejection-sampled against both bboxes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.eval import metrics as EM
from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.ops import lines as LN
from a_robust_registration_loss_tpu.ops import metric as M
from a_robust_registration_loss_tpu.se3 import se3


@dataclasses.dataclass(frozen=True)
class LossConfig:
    n_lines: int = 15000
    kmin: int = 1
    kmax: int = 4
    line_chunk: Optional[int] = 4096
    backend: str = "xla"          # "pallas" on TPU
    wt_inliers: float = 1e-2      # rpm/arguments.py (RPM only)
    cycle: bool = False           # DCP optional cycle consistency
    discount: float = 0.5
    # optional (dp, sp) jax.sharding.Mesh: when set, the per-batch line
    # buffers are constrained to P("dp", "sp") so GSPMD shards the heavy
    # stage-1 sweep over the line axis too (lines are i.i.d.; only stage 2's
    # exact median needs the re-replicated slot records — see
    # parallel/mesh.py). None = no constraint (single device or pure dp).
    mesh: Optional[object] = None

    def __post_init__(self):
        if self.kmax < self.kmin or self.kmin < 1:
            raise ValueError(
                f"need 1 <= kmin <= kmax (got kmin={self.kmin}, "
                f"kmax={self.kmax})")


def batch_lines(key, tar_box, centers, n_lines, verts1, verts2,
                radius_scale: float, mesh=None, backend: str = "xla"):
    """Per-batch line resampling: radius_scale * ||tar_box[0] - tar_box[-1]||
    per sample, vmapped over the batch (the reference's batched
    Random_uniform_distribution_lines_batch_efficient_resample call sites).
    verts1 is the *predicted-transformed* source (stop-gradient'd: line
    sampling is non-differentiable in the reference too).

    With a (dp, sp) ``mesh`` the returned (B, L, 6) buffer is constrained to
    P("dp", "sp") — batch over dp, lines over sp — and the resampler itself
    runs inside a ``shard_map`` whose per-device program is EXACTLY the
    unsharded one (replicated in/out specs): the accepted line set is
    bit-identical under any mesh. This matters because the barycentric
    accept test (ops/lines.py triangle_hits, reference loss.py:302-316) is
    ``A + B + C <= S`` — an exact-equality-sensitive comparison for EVERY
    true interior hit — so letting GSPMD repartition the producer flips ~5%
    of accepts through different fusion/FMA patterns (observed round 1).
    Cost of the replication: the resampler (a small fraction of the step;
    the O(L*F) stage-1 sweep still shards over dp x sp) is computed
    redundantly on each device instead of sp-parallel."""
    B = tar_box.shape[0]
    radius = radius_scale * jnp.linalg.norm(tar_box[:, 0] - tar_box[:, -1],
                                            axis=-1)
    keys = jax.random.split(key, B)
    v1 = jax.lax.stop_gradient(verts1)
    v2 = jax.lax.stop_gradient(verts2)

    def produce(keys, radius, centers, v1, v2):
        return jax.vmap(
            lambda k, r, c, a, b: LN.resample_lines(k, r, c, n_lines, a, b,
                                                    backend=backend)
        )(keys, radius, centers, v1, v2)

    if mesh is None:
        return produce(keys, radius, centers, v1, v2)

    from jax.sharding import PartitionSpec as P

    from a_robust_registration_loss_tpu.parallel import mesh as pmesh

    prod = jax.shard_map(produce, mesh=mesh, in_specs=(P(),) * 5,
                         out_specs=P())
    lines = prod(keys, radius, centers, v1, v2)
    return pmesh.constrain(lines, mesh, P("dp", "sp"))


def _metric_batch(src_neis_t, tar_neis, lines, cfg: LossConfig):
    """(B,) per-sample metric values with invalid samples zeroed."""
    losses, valid = M.intersection_loss_batch(
        src_neis_t, tar_neis, lines, cfg.kmin, cfg.kmax, cfg.line_chunk,
        backend=cfg.backend,
    )
    return jnp.where(valid, losses, 0.0)


def _metric_batch_rt(R_row, t, src_neis_raw, tar_neis, lines,
                     cfg: LossConfig):
    """(B,) per-sample metric of ``src_neis @ R_row + t`` vs tar — the
    gather-then-transform path (ops/metric.py:
    intersection_loss_transformed): identical value/grad to transforming the
    neighbor arrays first, but the backward reduces over the gathered slots
    instead of scatter-adding into the full neighbor array (the hottest op
    of a training step on TPU)."""

    if (cfg.mesh is not None and cfg.backend == "pallas"
            and dict(cfg.mesh.shape).get("sp", 1) > 1):
        return _metric_batch_rt_sp(R_row, t, src_neis_raw, tar_neis, lines,
                                   cfg)

    def per(R, tt, n1, n2, l):
        loss, valid = M.intersection_loss_rigid(
            R, tt, n1, n2, l, cfg.kmin, cfg.kmax,
            cfg.line_chunk, backend=cfg.backend,
        )
        return jnp.where(valid, loss, 0.0)

    return jax.vmap(per)(R_row, t, src_neis_raw, tar_neis, lines)


def _metric_batch_rt_sp(R_row, t, src_neis_raw, tar_neis, lines,
                        cfg: LossConfig, interpret: bool = False):
    """Line-parallel (sp) execution of the PALLAS rigid metric.

    GSPMD treats the fused kernel as an opaque custom call and gathers its
    operands (correct but replicated — parallel/mesh.py backend note); this
    path instead shard_maps the per-line stage (stage-1 kernel + slot
    reconstruction, ops/metric.py:_rigid_slots_lanemajor) over the mesh's
    sp axis so each device sweeps only its L/sp line shard, all_gathers the
    tiny per-line slot records (kmax*6+2 rows of L lanes) over sp, and runs
    the globally-coupled stage 2 (exact median) redundantly per sp member.
    Batch stays dp-sharded. Values equal the unsharded pallas path (each
    line's stage 1 is independent; the gather restores the full line set in
    order) — asserted by tests/test_parallel.py."""
    from jax.sharding import PartitionSpec as P

    mesh = cfg.mesh

    def local(Rl, tl_, n1l, n2l, ll):
        def slots(Rr, tt, a, b, l):
            return M._rigid_slots_lanemajor(Rr, tt, a, b, l, cfg.kmax,
                                            interpret)

        pts1, pts2, c1, c2 = jax.vmap(slots)(Rl, tl_, n1l, n2l, ll)

        def g(x):  # concat line shards back, in sp order, along lanes
            return jax.lax.all_gather(x, "sp", axis=x.ndim - 1, tiled=True)

        pts1, pts2, c1, c2 = g(pts1), g(pts2), g(c1), g(c2)
        losses, valids = jax.vmap(
            lambda a, b, u, v: M._stage2_lanemajor(a, b, u, v, cfg.kmin,
                                                   cfg.kmax)
        )(pts1, pts2, c1, c2)
        return jnp.where(valids, losses, 0.0)

    # check_vma=False: pallas_call does not declare varying-mesh-axes
    # metadata, which the default vma checker requires inside shard_map
    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp", "sp")),
        out_specs=P("dp"), check_vma=False)
    return shard(R_row, t, src_neis_raw, tar_neis, lines)


def _flat_neis(neighs):
    """(B, N*nnei, 3) neighbor buffers -> (B, N, nnei*3) metric layout."""
    B = neighs.shape[0]
    return neighs.reshape(B, -1, 9)


# ---------------------------------------------------------------------------
# DCP
# ---------------------------------------------------------------------------

def dcp_transform(points, R, t):
    """Column-convention p' = R p + t on (B, N, 3) points."""
    return jnp.einsum("bij,bnj->bni", R, points,
                      precision=jax.lax.Precision.HIGHEST) + t[:, None, :]


def dcp_cal_loss(data, R_ab, t_ab, key, cfg: LossConfig = LossConfig()):
    """The reference's cal_loss (dcp/Train_DCP.py:233-300): returns
    (loss_intersection, monitors dict). data is the DCP-adapter contract
    (column-convention R). Only loss_intersection carries gradients."""
    src = data["points_src_sample"]
    tar = data["points_tar_sample"]
    B = src.shape[0]
    pred_src = dcp_transform(src, R_ab, t_ab)
    src_neis_raw = _flat_neis(data["points_based_neighs_src"])
    tar_neis = _flat_neis(data["points_based_neighs_tar"])

    lines = batch_lines(key, data["tar_box"], data["centers"], cfg.n_lines,
                        pred_src, tar, radius_scale=0.5, mesh=cfg.mesh,
                        backend=cfg.backend)
    # column-convention (R p + t) == row form p @ R^T + t
    per_sample = _metric_batch_rt(jnp.swapaxes(R_ab, -1, -2), t_ab,
                                  src_neis_raw, tar_neis, lines, cfg) / 5.0
    loss_intersection = jnp.sum(per_sample) / B

    # monitors (dcp/Train_DCP.py:248-296) — all detached
    gt_src = jax.lax.stop_gradient(dcp_transform(src, data["R"], data["T"]))
    p = jax.lax.stop_gradient(pred_src)
    mae, rmse = EM.rotation_euler_errors(jax.lax.stop_gradient(R_ab),
                                         data["R"], seq="xyz")
    monitors = dict(
        loss_chamfer=G.chamfer_distance(p, tar),
        loss_pp_wise=EM.pp_wise_rmse(p, gt_src),
        loss_pp_wise_mae=EM.pp_wise_mae(p, gt_src),
        loss_pp_wise_ori=jnp.mean((src - gt_src) ** 2),
        loss_pp_wise_identity=EM.pp_wise_mae(p, src),
        loss_rotation=EM.rotation_mse(jax.lax.stop_gradient(R_ab), data["R"]),
        loss_translation=EM.translation_mse(jax.lax.stop_gradient(t_ab),
                                            data["T"]),
        loss_rot_euler_mae=mae,
        loss_rot_euler_rmse=rmse,
        loss_gt=EM.gt_consistency_loss(jax.lax.stop_gradient(R_ab),
                                       jax.lax.stop_gradient(t_ab),
                                       data["R"], data["T"]),
    )
    return loss_intersection, monitors


def dcp_cycle_loss(R_ab, t_ab, R_ba, t_ba):
    """Cycle consistency (dcp/Train_DCP.py:402-411): mse(R_ba R_ab, I) +
    mean((R_ba^T t_ab + t_ba)^2)."""
    B = R_ab.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R_ab.dtype), (B, 3, 3))
    rot = jnp.mean((jnp.matmul(R_ba, R_ab) - eye) ** 2)
    tr = jnp.mean(
        (jnp.einsum("bij,bi->bj", R_ba, t_ab) + t_ba) ** 2
    )
    return rot + tr


def dcp_train_loss(data, R_ab, t_ab, R_ba, t_ba, key,
                   cfg: LossConfig = LossConfig()):
    """The optimized total (dcp/Train_DCP.py:402-425):
    intersection (+ 0.1 * cycle when cfg.cycle)."""
    loss_inter, monitors = dcp_cal_loss(data, R_ab, t_ab, key, cfg)
    loss = loss_inter
    if cfg.cycle:
        cyc = dcp_cycle_loss(R_ab, t_ab, R_ba, t_ba)
        loss = loss + 0.1 * cyc
        monitors = dict(monitors, cycle_loss=jax.lax.stop_gradient(cyc))
    monitors = dict(monitors, loss_intersection=jax.lax.stop_gradient(loss_inter))
    return loss, monitors


# ---------------------------------------------------------------------------
# RPM-Net
# ---------------------------------------------------------------------------

def rpm_cal_loss(pred_transforms: Sequence[jax.Array],
                 perm_matrices: Sequence[jax.Array],
                 data, key, cfg: LossConfig = LossConfig(n_lines=10000)):
    """The reference BaseRPMNet.cal_loss (rpm/Train_RPM.py:184-280):
    returns (losses dict, pred_src_transformed_final).

    pred_transforms: per-iteration (B, 3, 4) column-convention transforms;
    perm_matrices: per-iteration (B, J, K) sinkhorn outputs.
    losses keys: loss_intersection, loss_chamfer, loss_reg, loss_gt
    (chamfer and gt detached monitors)."""
    num_iter = len(pred_transforms)
    src = data["points_src_sample"][..., :3]
    tar = data["points_tar_sample"]
    neighs_src = data["points_based_neighs_src"]
    tar_neis = _flat_neis(data["points_based_neighs_tar"])
    B = src.shape[0]

    lines = None
    inter_terms, chamfer_terms = [], []
    pred_src_final = None
    src_neis_raw = _flat_neis(neighs_src)
    for ni in range(num_iter):
        g = pred_transforms[ni]
        pred_src = se3.rt_transform(g, src)
        pred_src_final = pred_src
        if lines is None:
            # full diagonal radius — no 0.5 (Train_RPM.py:203-205)
            lines = batch_lines(key, data["tar_box"], data["centers"],
                                cfg.n_lines, pred_src, tar, radius_scale=1.0,
                                mesh=cfg.mesh, backend=cfg.backend)
        inter = jnp.sum(_metric_batch_rt(
            jnp.swapaxes(g[..., :3, :3], -1, -2), g[..., :3, 3],
            src_neis_raw, tar_neis, lines, cfg))
        inter_terms.append(inter / num_iter)  # Train_RPM.py:232
        chamfer_terms.append(
            jax.lax.stop_gradient(G.chamfer_distance(tar, pred_src))
        )

    reg_terms = []
    for ni in range(num_iter):
        perm = perm_matrices[ni]
        ref_outliers = (1.0 - jnp.sum(perm, axis=1)) * cfg.wt_inliers
        src_outliers = (1.0 - jnp.sum(perm, axis=2)) * cfg.wt_inliers
        reg_terms.append(jnp.mean(ref_outliers) + jnp.mean(src_outliers))

    def discounted(terms):
        return sum(
            t * cfg.discount ** (num_iter - ni - 1)
            for ni, t in enumerate(terms)
        )

    # gt monitor (Train_RPM.py:269-277): column transform built from the
    # row-convention GT (R^T is the column rotation)
    g = jnp.concatenate(
        [jnp.swapaxes(data["R"], -1, -2), data["T"][..., None]], axis=-1
    )
    gt_src = se3.rt_transform(g, src)
    losses = dict(
        loss_intersection=discounted(inter_terms),
        loss_chamfer=discounted(chamfer_terms),
        loss_reg=discounted(reg_terms),
        loss_gt=jax.lax.stop_gradient(
            jnp.mean(jnp.abs(gt_src - pred_src_final))
        ),
    )
    return losses, pred_src_final


def rpm_total_loss(losses: dict):
    """total = 10 * reg + 1 * intersection (rpm/Train_RPM.py:316)."""
    return 10.0 * losses["loss_reg"] + 1.0 * losses["loss_intersection"]


# ---------------------------------------------------------------------------
# FMR
# ---------------------------------------------------------------------------

def fmr_train_loss(g_series, loss_ende, data, key,
                   cfg: LossConfig = LossConfig(), maxiter: int = 5):
    """The reference's training-mode extras + total
    (fmr/model.py:259-313, 557-560): intersection on the last 3 IC iterates
    with 0.5^(maxiter - i - 1) discounts, lines sampled once against the
    final iterate's transformed source; total = 0.01 * ende + 1.0 * inter.

    g_series: (maxiter, B, 4, 4) un-normalized per-iterate transforms
    (models/fmr.py output). Returns (total, parts dict)."""
    src = data["points_src_sample"]
    tar = data["points_tar_sample"]
    neighs_src = data["points_based_neighs_src"]
    tar_neis = _flat_neis(data["points_based_neighs_tar"])
    B = src.shape[0]

    g_last = jax.lax.stop_gradient(g_series[maxiter - 1])
    pred_src_last = se3.transform(g_last[:, None], src)
    lines = batch_lines(key, data["tar_box"], data["centers"], cfg.n_lines,
                        pred_src_last, tar, radius_scale=0.5, mesh=cfg.mesh,
                        backend=cfg.backend)

    loss_inter = 0.0
    pred_src = pred_src_last
    src_neis_raw = _flat_neis(neighs_src)
    for i in range(max(0, maxiter - 3), maxiter):
        gi = g_series[i]
        pred_src = se3.transform(gi[:, None], src)
        tp = jnp.sum(_metric_batch_rt(
            jnp.swapaxes(gi[:, :3, :3], -1, -2), gi[:, :3, 3],
            src_neis_raw, tar_neis, lines, cfg) / 5.0)
        loss_inter = loss_inter + tp * cfg.discount ** (maxiter - i - 1)
    loss_inter = loss_inter / B

    # monitors (fmr/model.py:259-264, 310-311)
    igt_inv = jax.vmap(se3.inverse)(data["igt"])
    gt_src = se3.transform(igt_inv[:, None], src)
    g_final = g_series[maxiter - 1]
    loss_pp_wise = jnp.mean(
        jnp.abs(se3.transform(g_final[:, None], src) - gt_src)
    )
    loss_chamfer = G.chamfer_distance(jax.lax.stop_gradient(pred_src), tar)

    total = 0.01 * loss_ende + 1.0 * loss_inter
    parts = dict(
        loss_ende=jax.lax.stop_gradient(jnp.asarray(loss_ende)),
        loss_intersection=jax.lax.stop_gradient(loss_inter),
        loss_pp_wise=jax.lax.stop_gradient(loss_pp_wise),
        loss_chamfer=loss_chamfer,
    )
    return total, parts
