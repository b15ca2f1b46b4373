"""Unsupervised DCP training harness.

TPU-native re-design of dcp/Train_DCP.py: the supervised DCP network trained
with the intersected-line metric instead of GT labels. The reference's
train_one_epoch / test_one_epoch / checkpoint scaffolding (Train_DCP.py:
326-705) becomes one jitted train step + one jitted eval step run by the
shared Trainer (train/harness.py).

Faithful pieces: Adam lr=1e-6 (Train_DCP.py:553), loss = intersection
(+ 0.1 * cycle when enabled, :413,425), loss_gt/rot/trans/euler/pp-wise
monitors logged never optimized (:396-397, 272-300), eval metrics = pp-wise
MAE + chamfer of the transformed clouds (cal_test_loss, :307-323).

CLI:
    python -m a_robust_registration_loss_tpu.train.dcp \
        --data_path DIR --exp_dir EXP [--emb_nn pointnet|dgcnn] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os


import jax
import jax.numpy as jnp
import optax

from a_robust_registration_loss_tpu.eval import metrics as EM
from a_robust_registration_loss_tpu.models.dcp import DCP, DCPConfig
from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.train import harness
from a_robust_registration_loss_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class DCPTrainConfig:
    lr: float = 1e-6                      # Train_DCP.py:553
    # The reference fine-tunes a SUPERVISED-pretrained DCP with the
    # intersection loss (the pretrained load at Train_DCP.py:890-893; its
    # checkpoint blob is external). These produce that init in-repo: a
    # supervised pretrain on the GT the dataset contract already carries,
    # optimizing the reference's logged-only loss_gt (Train_DCP.py:393-397)
    # with a fresh Adam — the main phase then starts from the pretrained
    # params with a fresh optimizer, exactly like a checkpoint load.
    pretrain_epochs: int = 0
    pretrain_lr: float = 1e-4
    loss: L.LossConfig = L.LossConfig(n_lines=15000)
    model: DCPConfig = DCPConfig()
    fit: harness.FitConfig = harness.FitConfig()


def make_steps(cfg: DCPTrainConfig):
    """(model, optimizer, train_step, eval_step, pretrain_step,
    artifact_fn)."""
    model = DCP(cfg.model)
    optimizer = optax.adam(cfg.lr)
    pretrain_optimizer = optax.adam(cfg.pretrain_lr)

    def forward(params, batch):
        return model.apply({"params": params}, batch["points_src_sample"],
                           batch["points_tar_sample"])

    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            R_ab, t_ab, R_ba, t_ba = forward(p, batch)
            loss, monitors = L.dcp_train_loss(batch, R_ab, t_ab, R_ba, t_ba,
                                              key, cfg.loss)
            return loss, monitors

        (loss, monitors), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state, nonfinite = harness.guarded_update(
            optimizer, grads, opt_state, params, loss)
        return params, opt_state, dict(monitors, loss=loss,
                                       nonfinite_steps=nonfinite)

    def pretrain_step(params, opt_state, batch, key):
        """Supervised pretraining step: optimize loss_gt (the reference's
        logged-only supervised loss, Train_DCP.py:393-397) plus euler
        monitors — no line sampling, so it is cheap."""
        def loss_fn(p):
            R_ab, t_ab, _, _ = forward(p, batch)
            loss = EM.gt_consistency_loss(R_ab, t_ab, batch["R"], batch["T"])
            return loss, (R_ab, t_ab)

        (loss, (R_ab, t_ab)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state, nonfinite = harness.guarded_update(
            pretrain_optimizer, grads, opt_state, params, loss)
        mae, rmse = EM.rotation_euler_errors(jax.lax.stop_gradient(R_ab),
                                             batch["R"], seq="xyz")
        return params, opt_state, dict(
            loss=loss, loss_rot_euler_mae=mae, loss_rot_euler_rmse=rmse,
            loss_translation=EM.translation_mse(
                jax.lax.stop_gradient(t_ab), batch["T"]),
            nonfinite_steps=nonfinite)

    def eval_step(params, batch, key):
        """The reference test_one_epoch's per-batch battery
        (Train_DCP.py:62-230): loss_gt (+ 0.1 * cycle), pp-wise/chamfer
        (cal_test_loss, :307-323), mse/mae of the transformed clouds in BOTH
        directions, euler/translation errors — plus the test-set
        intersection loss as an extra monitor (the training objective
        measured on held-out pairs)."""
        R_ab, t_ab, R_ba, t_ba = forward(params, batch)
        loss_inter, monitors = L.dcp_cal_loss(batch, R_ab, t_ab, key,
                                              cfg.loss)
        src = batch["points_src_sample"]
        tar = batch["points_tar_sample"]
        pred = L.dcp_transform(src, R_ab, t_ab)
        gt = L.dcp_transform(src, batch["R"], batch["T"])
        pred_ba = L.dcp_transform(tar, R_ba, t_ba)
        gt_ba = L.dcp_transform(tar, batch["R_inv"], batch["T_inv"])
        loss_gt = EM.gt_consistency_loss(R_ab, t_ab, batch["R"], batch["T"])
        loss = loss_gt
        out = dict(
            monitors,
            loss_intersection=loss_inter,
            loss_pp_wise=EM.pp_wise_mae(pred, gt),   # cal_test_loss pp_wise
            mse_ab=jnp.mean((pred - gt) ** 2),
            mae_ab=jnp.mean(jnp.abs(pred - gt)),
            mse_ba=jnp.mean((pred_ba - gt_ba) ** 2),
            mae_ba=jnp.mean(jnp.abs(pred_ba - gt_ba)),
        )
        if cfg.loss.cycle:
            cyc = L.dcp_cycle_loss(R_ab, t_ab, R_ba, t_ba)
            loss = loss + 0.1 * cyc
            out["cycle_loss"] = cyc
        # test_one_epoch's total_loss is loss_gt (+ 0.1 cycle),
        # Train_DCP.py:121-141
        out["loss"] = loss
        return out

    def artifact_fn(params, batch, key):
        R_ab, t_ab, _, _ = forward(params, batch)
        pred = L.dcp_transform(batch["points_src_sample"], R_ab, t_ab)
        gt = L.dcp_transform(batch["points_src_sample"], batch["R"],
                             batch["T"])
        return (batch["points_src_sample"][0], pred[0],
                batch["points_tar_sample"][0], gt[0])

    return model, optimizer, train_step, eval_step, pretrain_step, artifact_fn


def init_params(model, key, batch):
    return model.init(key, batch["points_src_sample"],
                      batch["points_tar_sample"])["params"]


def train(cfg: DCPTrainConfig, train_loader, test_loader=None,
          init_from=None, log=print, mesh=None):
    """Full training entry (the reference's train(), Train_DCP.py:534-705).
    Returns (params, history)."""
    from a_robust_registration_loss_tpu.data import dataset as DS

    (model, optimizer, train_step, eval_step, pretrain_step,
     artifact_fn) = make_steps(cfg)
    # device-resident epochs (verdict r3 task 1): cacheable datasets are
    # transferred once and each epoch runs as one scanned device program
    train_loader = DS.maybe_device_cache(train_loader)
    if test_loader is not None:
        test_loader = DS.maybe_device_cache(test_loader)
    batch0 = next(iter(train_loader))
    key = jax.random.PRNGKey(cfg.fit.seed)
    params = init_from if init_from is not None else init_params(model, key,
                                                                 batch0)

    if cfg.pretrain_epochs:
        # supervised pretrain phase (the init the reference LOADS,
        # Train_DCP.py:890-893, produced in-repo): its own Trainer so the
        # scanned-epoch fast path applies; fresh optimizer both phases
        pre_fit = dataclasses.replace(
            cfg.fit, epochs=cfg.pretrain_epochs,
            exp_dir=os.path.join(cfg.fit.exp_dir, "pretrain"))
        pre_opt = optax.adam(cfg.pretrain_lr)
        pre_trainer = harness.Trainer(pretrain_step, None, pre_fit,
                                      score_key="loss", score_mode="min",
                                      mesh=mesh)
        params, _, pre_hist = pre_trainer.fit(
            params, pre_opt.init(params), train_loader,
            log=lambda m: log(f"[pretrain] {m}"))

    opt_state = optimizer.init(params)
    trainer = harness.Trainer(train_step, eval_step, cfg.fit,
                              score_key="loss", score_mode="min",
                              artifact_fn=artifact_fn, mesh=mesh)
    params, _, history = trainer.fit(params, opt_state, train_loader,
                                     test_loader, log=log)
    return params, history


def evaluate(cfg: DCPTrainConfig, params, test_loader, out_dir: str,
             log=print, epoch: int = 0, save_objs: bool = True):
    """The reference's full test_one_epoch artifact pass
    (Train_DCP.py:62-230 + the train-loop euler aggregation :567-680):
    per-batch battery (loss_gt/cycle/pp-wise/chamfer/intersection,
    mse/mae of transformed clouds both directions), EXACT whole-set Euler +
    translation error aggregation over the concatenated predictions (the
    reference concatenates all rotations then means, :215-228 + npmat2euler),
    per-pair obj dumps in the reference's ``{epoch}_{i}*.obj`` naming
    (:176-214), and an ``Eval.json`` summary. Returns the summary dict."""
    import json
    import os

    import numpy as np

    model, _, _, eval_step, _, _ = make_steps(cfg)

    @jax.jit
    def step(params, batch, key):
        """eval_step + the predictions/transformed clouds the artifact path
        needs, in ONE program — XLA CSEs the shared DCP forward, so the
        network runs once per batch instead of three times."""
        metrics = eval_step(params, batch, key)
        R_ab, t_ab, R_ba, t_ba = model.apply(
            {"params": params}, batch["points_src_sample"],
            batch["points_tar_sample"])
        pred = L.dcp_transform(batch["points_src_sample"], R_ab, t_ab)
        gt_src = L.dcp_transform(batch["points_src_sample"], batch["R"],
                                 batch["T"])
        return metrics, (R_ab, t_ab, R_ba, t_ba), pred, gt_src

    os.makedirs(out_dir, exist_ok=True)
    agg, n_batches = {}, 0
    R_ab_l, t_ab_l, R_ba_l, t_ba_l = [], [], [], []
    gR_ab_l, gt_ab_l, gR_ba_l, gt_ba_l = [], [], [], []
    key = jax.random.PRNGKey(0)
    count_i = 0
    for k, batch in enumerate(test_loader):
        key, sub = jax.random.split(key)
        metrics, tf, pred_d, gt_d = jax.device_get(step(params, batch, sub))
        R_ab, t_ab, R_ba, t_ba = tf
        for mk, v in metrics.items():
            agg[mk] = agg.get(mk, 0.0) + float(v)
        n_batches += 1
        R_ab_l.append(R_ab), t_ab_l.append(t_ab)
        R_ba_l.append(R_ba), t_ba_l.append(t_ba)
        gR_ab_l.append(np.asarray(batch["R"]))
        gt_ab_l.append(np.asarray(batch["T"]))
        gR_ba_l.append(np.asarray(batch["R_inv"]))
        gt_ba_l.append(np.asarray(batch["T_inv"]))
        log(f"i{k}, loss_gt:{float(metrics['loss_gt']):4f}, "
            f"loss_pp_wise{float(metrics['loss_pp_wise']):4f}, "
            f"loss_chamfer{float(metrics['loss_chamfer']):4f}")
        if save_objs:
            src = np.asarray(batch["points_src_sample"])
            pred = np.asarray(pred_d)
            gt_src = np.asarray(gt_d)
            tar = np.asarray(batch["points_tar_sample"])
            from a_robust_registration_loss_tpu.data import objio

            for b in range(src.shape[0]):
                # reference naming: {epoch}_{i}pred_src/gt/src/src_gt.obj
                # (Train_DCP.py:176-207; 'gt' is the TARGET cloud there)
                pre = os.path.join(out_dir, f"{epoch}_{count_i}")
                objio.write_obj(pre + "pred_src.obj", pred[b])
                objio.write_obj(pre + "gt.obj", tar[b])
                objio.write_obj(pre + "src.obj", src[b])
                objio.write_obj(pre + "src_gt.obj", gt_src[b])
                count_i += 1

    summary = {k: v / max(n_batches, 1) for k, v in agg.items()}

    def euler_stats(R_pred, R_gt, t_pred, t_gt, suffix):
        e_p = np.asarray(EM.mat2euler(jnp.asarray(np.concatenate(R_pred)),
                                      seq="xyz"))
        e_g = np.asarray(EM.mat2euler(jnp.asarray(np.concatenate(R_gt)),
                                      seq="xyz"))
        tp, tg = np.concatenate(t_pred), np.concatenate(t_gt)
        r_mse = float(np.mean((e_p - e_g) ** 2))
        t_mse = float(np.mean((tp - tg) ** 2))
        return {
            f"r_mse_{suffix}": r_mse,
            f"r_rmse_{suffix}": float(np.sqrt(r_mse)),
            f"r_mae_{suffix}": float(np.mean(np.abs(e_p - e_g))),
            f"t_mse_{suffix}": t_mse,
            f"t_rmse_{suffix}": float(np.sqrt(t_mse)),
            f"t_mae_{suffix}": float(np.mean(np.abs(tp - tg))),
        }

    summary.update(euler_stats(R_ab_l, gR_ab_l, t_ab_l, gt_ab_l, "ab"))
    summary.update(euler_stats(R_ba_l, gR_ba_l, t_ba_l, gt_ba_l, "ba"))
    summary["rmse_ab"] = float(np.sqrt(summary["mse_ab"]))
    summary["rmse_ba"] = float(np.sqrt(summary["mse_ba"]))
    with open(os.path.join(out_dir, "Eval.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log("EVAL " + " ".join(
        f"{k}={summary[k]:.6f}"
        for k in ("loss", "loss_intersection", "loss_chamfer", "rmse_ab",
                  "r_rmse_ab", "r_mae_ab", "t_rmse_ab")))
    return summary


def main(argv=None):
    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--exp_dir", default="./exps/dcp")
    ap.add_argument("--layout", default="indexed", choices=["indexed", "views"])
    ap.add_argument("--n_pairs", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--pretrain_epochs", type=int, default=0,
                    help="supervised pretrain epochs on the GT loss before "
                         "the unsupervised phase — produces in-repo the "
                         "pretrained init the reference loads "
                         "(Train_DCP.py:890-893)")
    ap.add_argument("--pretrain_lr", type=float, default=1e-4)
    ap.add_argument("--n_lines", type=int, default=15000)
    ap.add_argument("--emb_nn", default="pointnet", choices=["pointnet", "dgcnn"])
    ap.add_argument("--pointer", default="transformer",
                    choices=["transformer", "identity"])
    ap.add_argument("--head", default="svd", choices=["svd", "mlp"])
    ap.add_argument("--emb_dims", type=int, default=512)
    ap.add_argument("--n_blocks", type=int, default=1)
    ap.add_argument("--n_heads", type=int, default=4)
    ap.add_argument("--ff_dims", type=int, default=1024)
    ap.add_argument("--cycle", action="store_true")
    ap.add_argument("--train_count", type=int, default=None,
                    help="train/test split: first N pairs train, rest test")
    ap.add_argument("--eval_only", action="store_true",
                    help="reload the latest checkpoint and run the full "
                         "test_one_epoch artifact pass (metric battery + "
                         "obj dumps + Eval.json, Train_DCP.py:62-230)")
    ap.add_argument("--init_from_ckpt", default=None,
                    help="initialize params from ANOTHER experiment's "
                         "checkpoints (fresh optimizer) — the jax-side "
                         "pretrained-init workflow (Train_DCP.py:890-893); "
                         "note --exp_dir's own checkpoints still take "
                         "precedence when resuming")
    ap.add_argument("--init_from_torch", default=None,
                    help="a reference DCP .pth checkpoint to transplant as "
                         "the initialization (the reference fine-tunes from "
                         "a supervised-pretrained net, Train_DCP.py:890-893)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (bfloat16 = TPU mixed "
                         "precision; params, norms, SVD, and the metric "
                         "stay fp32)")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="auto = pallas on TPU, xla elsewhere")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. cpu) — the axon TPU "
                         "plugin ignores the JAX_PLATFORMS env var")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel device count (0 = single device); "
                         "creates a (dp, sp) mesh and shards batches over it")
    ap.add_argument("--sp", type=int, default=1,
                    help="line-parallel device count: shards the metric's "
                         "line axis over the mesh's sp axis (lines are "
                         "i.i.d.; see parallel/mesh.py)")
    ap.add_argument("--debug_nans", action="store_true",
                    help="raise on NaN in any jitted op (the reference's "
                         "--debug autograd anomaly mode, rpm/arguments.py:22-24)")
    ap.add_argument("--debug", action="store_true",
                    help="anomaly detection + pdb post-mortem on NaN (the "
                         "reference's TorchDebugger, rpm/common/torch.py:161-172)")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans or args.debug:
        jax.config.update("jax_debug_nans", True)
    if args.debug:
        from a_robust_registration_loss_tpu.utils import debug as DBG

        DBG.install_pdb_excepthook()
    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")
    mesh = None
    if args.dp or args.sp > 1:
        from a_robust_registration_loss_tpu.parallel import mesh as pmesh

        dp = args.dp or 1
        mesh = pmesh.make_mesh(dp=dp, sp=args.sp,
                               devices=jax.devices()[: dp * args.sp])

    train_loader, test_loader = DS.generate_datasets(DS.DatasetConfig(
        data_path=args.data_path, layout=args.layout, n=args.n_pairs,
        train_batch=args.batch_size, dcp=True, seed=args.seed,
        train_count=args.train_count))
    cfg = DCPTrainConfig(
        lr=args.lr,
        pretrain_epochs=args.pretrain_epochs,
        pretrain_lr=args.pretrain_lr,
        loss=L.LossConfig(n_lines=args.n_lines, cycle=args.cycle,
                          backend=args.backend, mesh=mesh),
        model=DCPConfig(emb_nn=args.emb_nn, pointer=args.pointer,
                        head=args.head, emb_dims=args.emb_dims,
                        n_blocks=args.n_blocks, n_heads=args.n_heads,
                        ff_dims=args.ff_dims, cycle=args.cycle,
                        dtype=args.dtype),
        fit=harness.FitConfig(epochs=args.epochs, exp_dir=args.exp_dir,
                              seed=args.seed, artifacts_every=10),
    )
    init_from = None
    if args.init_from_torch:
        from a_robust_registration_loss_tpu.models import transplant

        sd = transplant.load_torch_state_dict(args.init_from_torch)
        init_from = transplant.dcp_from_state_dict(sd,
                                                   n_blocks=cfg.model.n_blocks)
    if args.init_from_ckpt:
        from a_robust_registration_loss_tpu.utils import load_params_from

        if init_from is not None:
            ap.error("--init_from_ckpt and --init_from_torch are exclusive")
        model, optimizer, _, _, _, _ = make_steps(cfg)
        b0 = next(iter(train_loader), None)
        if b0 is None:
            b0 = next(iter(test_loader))
        p0 = init_params(model, jax.random.PRNGKey(cfg.fit.seed), b0)
        init_from = load_params_from(
            args.init_from_ckpt,
            {"params": p0, "opt_state": optimizer.init(p0), "epoch": 0})
        if init_from is None:
            ap.error(f"no checkpoint under {args.init_from_ckpt}")
    if args.eval_only:
        import os

        from a_robust_registration_loss_tpu.utils import CheckPointManager

        model, optimizer, _, _, _, _ = make_steps(cfg)
        # init SHAPES only; the train split can be empty in eval-only runs
        batch0 = next(iter(train_loader), None)
        if batch0 is None:
            batch0 = next(iter(test_loader))
        params = (init_from if init_from is not None else
                  init_params(model, jax.random.PRNGKey(cfg.fit.seed), batch0))
        ckpt = CheckPointManager(os.path.join(args.exp_dir, "checkpoints"))
        state, _ = ckpt.load({"params": params,
                              "opt_state": optimizer.init(params),
                              "epoch": 0})
        epoch = 0
        if state is not None:
            params = state["params"]
            epoch = int(state["epoch"])
        evaluate(cfg, params, test_loader, os.path.join(args.exp_dir, "eval"),
                 epoch=epoch)
    else:
        train(cfg, train_loader, test_loader, init_from=init_from, mesh=mesh)


if __name__ == "__main__":
    main()
