"""Unsupervised FMR training + evaluation harness.

TPU-native re-design of fmr/Train_FMR.py + FMRTrain/FMRTest
(fmr/model.py:485-892): the feature-metric registration solver trained with
the AE chamfer loss + the intersected-line metric on the last 3 IC iterates.

Faithful pieces:
- total = 0.01 * loss_ende + 1.0 * loss_intersection (fmr/model.py:557-560);
- Adam lr=1e-6 (fmr/Train_FMR.py:190);
- train maxiter=5, eval maxiter=10 (fmr/model.py:489, 758);
- val loss = comp_inv = mse(g_hat, inverse(igt)) (fmr/model.py:471-481,
  validate :645-663);
- eval entry writes the twist CSV (eval_1__header/write,
  fmr/model.py:875-892) and the dm = ||log(g_hat . igt)|| metric (:799-805).

CLI:
    python -m a_robust_registration_loss_tpu.train.fmr \
        --data_path DIR --exp_dir EXP [--eval_only --ckpt PATH] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from a_robust_registration_loss_tpu.eval import metrics as EM
from a_robust_registration_loss_tpu.models.fmr import FMRConfig, SolveRegistration
from a_robust_registration_loss_tpu.se3 import se3
from a_robust_registration_loss_tpu.train import harness
from a_robust_registration_loss_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class FMRTrainConfig:
    lr: float = 1e-6                       # fmr/Train_FMR.py:190
    train_maxiter: int = 5                 # fmr/model.py:489
    eval_maxiter: int = 10                 # fmr/model.py:758
    loss: L.LossConfig = L.LossConfig(n_lines=15000)
    model: FMRConfig = FMRConfig()
    fit: harness.FitConfig = harness.FitConfig()


def make_steps(cfg: FMRTrainConfig):
    model = SolveRegistration(cfg.model)

    def forward(params, batch, maxiter):
        return model.apply({"params": params}, batch["points_tar_sample"],
                           batch["points_src_sample"], maxiter=maxiter)

    optimizer = optax.adam(cfg.lr)

    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            out = forward(p, batch, cfg.train_maxiter)
            total, parts = L.fmr_train_loss(out["g_series"], out["loss_ende"],
                                            batch, key, cfg.loss,
                                            maxiter=cfg.train_maxiter)
            return total, (parts, out)

        (loss, (parts, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state, nonfinite = harness.guarded_update(
            optimizer, grads, opt_state, params, loss)
        igt_inv = jax.vmap(se3.inverse)(batch["igt"])
        loss_g = jnp.mean((out["g"] - igt_inv) ** 2)
        mae, rmse = EM.rotation_euler_errors(
            jnp.swapaxes(out["g"][:, :3, :3], -1, -2), batch["R"], seq="xyz")
        return params, opt_state, dict(
            parts, loss=loss, loss_gt=loss_g,
            loss_rot_euler_mae=mae, loss_rot_euler_rmse=rmse,
            nonfinite_steps=nonfinite,
            # samples whose singular JtJ froze the IC solve (models/fmr.py)
            n_singular=jnp.asarray(out["n_singular"], jnp.float32),
        )

    def eval_step(params, batch, key):
        """validate (fmr/model.py:645-663): loss = comp_inv, plus pp-wise and
        euler monitors and the dm twist error."""
        out = forward(params, batch, cfg.eval_maxiter)
        g = out["g"]
        igt_inv = jax.vmap(se3.inverse)(batch["igt"])
        src = batch["points_src_sample"]
        pred = se3.transform(g[:, None], src)
        gt_src = se3.transform(igt_inv[:, None], src)
        dm, _ = EM.dm_twist_error(g, batch["igt"])
        mae, rmse = EM.rotation_euler_errors(
            jnp.swapaxes(g[:, :3, :3], -1, -2), batch["R"], seq="xyz")
        return dict(
            loss=jnp.mean((g - igt_inv) ** 2),   # comp_inv
            loss_pp_wise=jnp.mean(jnp.abs(pred - gt_src)),
            loss_ende=jnp.asarray(out["loss_ende"]),
            dm=dm,
            loss_rot_euler_mae=mae,
            loss_rot_euler_rmse=rmse,
            n_singular=jnp.asarray(out["n_singular"], jnp.float32),
        )

    def artifact_fn(params, batch, key):
        out = forward(params, batch, cfg.eval_maxiter)
        src = batch["points_src_sample"]
        pred = se3.transform(out["g"][:, None], src)
        igt_inv = jax.vmap(se3.inverse)(batch["igt"])
        gt = se3.transform(igt_inv[:, None], src)
        return src[0], pred[0], batch["points_tar_sample"][0], gt[0]

    return model, optimizer, train_step, eval_step, artifact_fn


def init_params(model, key, batch, maxiter=2):
    return model.init(key, batch["points_tar_sample"],
                      batch["points_src_sample"], maxiter=maxiter)["params"]


def train(cfg: FMRTrainConfig, train_loader, test_loader=None,
          init_from=None, log=print, mesh=None):
    from a_robust_registration_loss_tpu.data import dataset as DS

    model, optimizer, train_step, eval_step, artifact_fn = make_steps(cfg)
    # device-resident epochs (verdict r3 task 1)
    train_loader = DS.maybe_device_cache(train_loader)
    if test_loader is not None:
        test_loader = DS.maybe_device_cache(test_loader)
    batch0 = next(iter(train_loader))
    key = jax.random.PRNGKey(cfg.fit.seed)
    params = init_from if init_from is not None else init_params(model, key,
                                                                 batch0)
    opt_state = optimizer.init(params)
    trainer = harness.Trainer(train_step, eval_step, cfg.fit,
                              score_key="loss", score_mode="min",
                              artifact_fn=artifact_fn, mesh=mesh)
    params, _, history = trainer.fit(params, opt_state, train_loader,
                                     test_loader, log=log)
    return params, history


def ablate_batch(batch, rng, add_noise: bool = False,
                 add_density: bool = False, density_ratio: float = 0.5):
    """FMRTest's ablation hooks (fmr/model.py:848-873): gaussian 0.01 noise
    on the source and/or a random density_ratio subset of it."""
    batch = dict(batch)
    p1 = np.asarray(batch["points_src_sample"])
    if add_noise:
        p1 = rng.normal(p1, 0.01).astype(np.float32)
    if add_density:
        n = p1.shape[1]
        keep = rng.choice(np.arange(1, n), size=int(n * density_ratio),
                          replace=False)
        p1 = p1[:, keep]
    batch["points_src_sample"] = p1
    return batch


def evaluate(cfg: FMRTrainConfig, params, test_loader, out_dir: str,
             log=print, add_noise: bool = False, add_density: bool = False,
             seed: int = 0, save_objs: bool = False):
    """FMRTest.evaluate (fmr/model.py:746-846): per-pair dm + twist CSV
    (eval_1__header/write) + summary, with the reference's noise/density
    ablation hooks; ``save_objs`` additionally dumps src/pred/gt clouds per
    pair (the reference's save_pred_gt_obj, fmr/model.py:810-846). Returns
    the mean dm."""
    model, _, _, _, _ = make_steps(cfg)

    def g_of(p, batch, key):
        # params passed as an ARG: closure-capturing device arrays in a jit
        # poisons axon dispatch pipelining process-wide (train/classical.py
        # make_step docstring)
        out = model.apply({"params": p}, batch["points_tar_sample"],
                          batch["points_src_sample"],
                          maxiter=cfg.eval_maxiter)
        return out["g"]

    g_jit = jax.jit(g_of)
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "eval_twists.csv")
    dms = []
    key = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(seed)
    with open(csv_path, "w") as fout:
        print(EM.TWIST_CSV_HEADER, file=fout)
        for i, batch in enumerate(test_loader):
            if add_noise or add_density:
                batch = ablate_batch(batch, np_rng, add_noise, add_density)
            key, sub = jax.random.split(key)
            g = g_jit(params, batch, sub)
            dm, dn = EM.dm_twist_error(g, jnp.asarray(batch["igt"]))
            rows = np.asarray(EM.twist_csv_rows(g, jnp.asarray(batch["igt"])))
            for r in rows:
                print(",".join(str(float(v)) for v in r), file=fout)
            dms.extend(np.asarray(dn).tolist())
            if save_objs:
                src = jnp.asarray(batch["points_src_sample"])
                pred = se3.transform(g[:, None], src)
                igt_inv = jax.vmap(se3.inverse)(jnp.asarray(batch["igt"]))
                gt = se3.transform(igt_inv[:, None], src)
                harness.dump_registration_objs(
                    out_dir, f"pair{i}", np.asarray(src[0]),
                    np.asarray(pred[0]),
                    np.asarray(batch["points_tar_sample"][0]),
                    np.asarray(gt[0]))
                # the reference's colored-ply + viewer artifact set
                # (evaluate_fmr.py:34-43), headless
                from a_robust_registration_loss_tpu.utils import viz

                viz.draw_registration_result(
                    np.asarray(src[0]),
                    np.asarray(batch["points_tar_sample"][0]),
                    np.asarray(g[0]),
                    os.path.join(out_dir, f"pair{i}_viz"))
            log(f"test, {i}/{len(test_loader)}, dm={float(dm):.6f}")
    mean_dm = float(np.mean(dms)) if dms else float("nan")
    with open(os.path.join(out_dir, "eval_summary.json"), "w") as f:
        import json

        json.dump({"mean_dm": mean_dm, "n": len(dms)}, f)
    log(f"mean dm: {mean_dm:.6f} over {len(dms)} pairs -> {csv_path}")
    return mean_dm


def main(argv=None):
    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--exp_dir", default="./exps/fmr")
    ap.add_argument("--layout", default="indexed", choices=["indexed", "views"])
    ap.add_argument("--n_pairs", type=int, default=4)
    ap.add_argument("--train_count", type=int, default=None,
                    help="train/test split: first N pairs train, rest test")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_lines", type=int, default=15000)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--dim_k", type=int, default=1024)
    ap.add_argument("--train_maxiter", type=int, default=5)
    ap.add_argument("--eval_maxiter", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (bfloat16 = TPU mixed "
                         "precision; params, norms, the IC solver, and the "
                         "metric stay fp32)")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="auto = pallas on TPU, xla elsewhere")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--init_from_ckpt", default=None,
                    help="initialize params from ANOTHER experiment's "
                         "checkpoints (fresh optimizer) — the jax-side "
                         "pretrained-init workflow; --exp_dir's own "
                         "checkpoints still take precedence when resuming")
    ap.add_argument("--init_from_torch", default=None,
                    help="a reference FMR .pth checkpoint to transplant as "
                         "the initialization (Train_FMR.py --pretrained). "
                         "With --eval_only this reproduces evaluate_fmr.py's "
                         "load: decoder.* keys stripped, decoder left at "
                         "random init (evaluate_fmr.py:165-173)")
    ap.add_argument("--add_noise", action="store_true",
                    help="eval ablation: gaussian 0.01 noise on the source "
                         "(fmr/model.py:854-856)")
    ap.add_argument("--add_density", action="store_true",
                    help="eval ablation: random 50%% source subset "
                         "(fmr/model.py:858-871)")
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
        train_batch=args.batch_size, fmr=True, seed=args.seed,
        train_count=args.train_count))
    # shapes only; the train split can be empty in eval-only runs
    batch0 = next(iter(train_loader), None)
    if batch0 is None:
        batch0 = next(iter(test_loader))
    n_pts = batch0["points_src_sample"].shape[1]
    cfg = FMRTrainConfig(
        lr=args.lr,
        train_maxiter=args.train_maxiter, eval_maxiter=args.eval_maxiter,
        loss=L.LossConfig(n_lines=args.n_lines, backend=args.backend,
                          mesh=mesh),
        model=FMRConfig(dim_k=args.dim_k, num_points=n_pts,
                        dtype=args.dtype),
        fit=harness.FitConfig(epochs=args.epochs, exp_dir=args.exp_dir,
                              seed=args.seed, artifacts_every=10),
    )
    if args.init_from_ckpt and args.init_from_torch:
        ap.error("--init_from_ckpt and --init_from_torch are exclusive")
    if args.eval_only:
        model, optimizer, train_step, eval_step, _ = make_steps(cfg)
        params = init_params(model, jax.random.PRNGKey(cfg.fit.seed), batch0)
        if args.init_from_torch:
            # the reference eval loads the pretrained net minus decoder.*
            # keys (evaluate_fmr.py:165-173); decoder stays randomly init
            from a_robust_registration_loss_tpu.models import transplant

            sd = transplant.load_torch_state_dict(args.init_from_torch)
            params = transplant.merge_params(
                params, transplant.fmr_from_state_dict(sd, use_decoder=False))
        else:
            from a_robust_registration_loss_tpu.utils import CheckPointManager

            ckpt = CheckPointManager(os.path.join(args.exp_dir, "checkpoints"))
            state, _ = ckpt.load({"params": params,
                                  "opt_state": optimizer.init(params),
                                  "epoch": 0})
            if state is not None:
                params = state["params"]
        evaluate(cfg, params, test_loader, os.path.join(args.exp_dir, "eval"),
                 add_noise=args.add_noise, add_density=args.add_density,
                 seed=args.seed)
    else:
        init_from = None
        if args.init_from_torch:
            # training from a reference pretrained net (Train_FMR.py
            # --pretrained, :107-123): full tree incl. decoder when present
            from a_robust_registration_loss_tpu.models import transplant

            model, _, _, _, _ = make_steps(cfg)
            p0 = init_params(model, jax.random.PRNGKey(cfg.fit.seed), batch0)
            sd = transplant.load_torch_state_dict(args.init_from_torch)
            init_from = transplant.merge_params(
                p0, transplant.fmr_from_state_dict(sd, use_decoder=True))
        if args.init_from_ckpt:
            from a_robust_registration_loss_tpu.utils import load_params_from

            model, optimizer, _, _, _ = make_steps(cfg)
            p0 = init_params(model, jax.random.PRNGKey(cfg.fit.seed), batch0)
            init_from = load_params_from(
                args.init_from_ckpt,
                {"params": p0, "opt_state": optimizer.init(p0), "epoch": 0})
            if init_from is None:
                ap.error(f"no checkpoint under {args.init_from_ckpt}")
        train(cfg, train_loader, test_loader, init_from=init_from, mesh=mesh)


if __name__ == "__main__":
    main()
