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


import jax
import optax

from a_robust_registration_loss_tpu.eval import metrics as EM
from a_robust_registration_loss_tpu.models.dcp import DCP, DCPConfig
from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.train import harness
from a_robust_registration_loss_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class DCPTrainConfig:
    lr: float = 1e-6                      # Train_DCP.py:553
    loss: L.LossConfig = L.LossConfig(n_lines=15000)
    model: DCPConfig = DCPConfig()
    fit: harness.FitConfig = harness.FitConfig()


def make_steps(cfg: DCPTrainConfig):
    """(model, optimizer, train_step, eval_step, artifact_fn)."""
    model = DCP(cfg.model)
    optimizer = optax.adam(cfg.lr)

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
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(monitors, loss=loss)

    def eval_step(params, batch, key):
        R_ab, t_ab, _, _ = forward(params, batch)
        pred = L.dcp_transform(batch["points_src_sample"], R_ab, t_ab)
        gt = L.dcp_transform(batch["points_src_sample"], batch["R"],
                             batch["T"])
        mae, rmse = EM.rotation_euler_errors(R_ab, batch["R"], seq="xyz")
        return dict(
            loss=EM.pp_wise_mae(pred, gt),   # cal_test_loss pp_wise
            loss_chamfer=G.chamfer_distance(pred,
                                            batch["points_tar_sample"]),
            loss_rot_euler_mae=mae,
            loss_rot_euler_rmse=rmse,
            loss_translation=EM.translation_mse(t_ab, batch["T"]),
        )

    def artifact_fn(params, batch, key):
        R_ab, t_ab, _, _ = forward(params, batch)
        pred = L.dcp_transform(batch["points_src_sample"], R_ab, t_ab)
        gt = L.dcp_transform(batch["points_src_sample"], batch["R"],
                             batch["T"])
        return (batch["points_src_sample"][0], pred[0],
                batch["points_tar_sample"][0], gt[0])

    return model, optimizer, train_step, eval_step, artifact_fn


def init_params(model, key, batch):
    return model.init(key, batch["points_src_sample"],
                      batch["points_tar_sample"])["params"]


def train(cfg: DCPTrainConfig, train_loader, test_loader=None,
          init_from=None, log=print, mesh=None):
    """Full training entry (the reference's train(), Train_DCP.py:534-705).
    Returns (params, history)."""
    model, optimizer, train_step, eval_step, artifact_fn = make_steps(cfg)
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


def main(argv=None):
    from a_robust_registration_loss_tpu.data import dataset as DS

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--exp_dir", default="./exps/dcp")
    ap.add_argument("--layout", default="indexed", choices=["indexed", "views"])
    ap.add_argument("--n_pairs", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-6)
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
    ap.add_argument("--init_from_torch", default=None,
                    help="a reference DCP .pth checkpoint to transplant as "
                         "the initialization (the reference fine-tunes from "
                         "a supervised-pretrained net, Train_DCP.py:890-893)")
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
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
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
        train_batch=args.batch_size, dcp=True, seed=args.seed))
    cfg = DCPTrainConfig(
        lr=args.lr,
        loss=L.LossConfig(n_lines=args.n_lines, cycle=args.cycle,
                          backend=args.backend, mesh=mesh),
        model=DCPConfig(emb_nn=args.emb_nn, pointer=args.pointer,
                        head=args.head, emb_dims=args.emb_dims,
                        n_blocks=args.n_blocks, n_heads=args.n_heads,
                        ff_dims=args.ff_dims, cycle=args.cycle),
        fit=harness.FitConfig(epochs=args.epochs, exp_dir=args.exp_dir,
                              seed=args.seed, artifacts_every=10),
    )
    init_from = None
    if args.init_from_torch:
        import torch

        from a_robust_registration_loss_tpu.models import transplant

        sd = torch.load(args.init_from_torch, map_location="cpu")
        sd = sd.get("state_dict", sd)
        sd = {k: v.cpu().numpy() for k, v in sd.items()}
        init_from = transplant.dcp_from_state_dict(sd,
                                                   n_blocks=cfg.model.n_blocks)
    train(cfg, train_loader, test_loader, init_from=init_from, mesh=mesh)


if __name__ == "__main__":
    main()
