"""FMR eval ablations on the trained convergence checkpoint.

The reference's FMRTest carries noise/density ablation hooks
(fmr/model.py:848-873: gaussian 0.01 source noise; random 50% source
subset) used for the paper's robustness tables. This driver runs our
`train.fmr.evaluate` over the held-out split of the convergence dataset in
all three modes — clean / +noise / +density — from the checkpoint the
1,559-epoch run saved, and records benchmarks/FMR_ABLATIONS.json.

Usage: python benchmarks/fmr_ablations.py   (expects exps/fmr_convergence)
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp_dir", default=os.path.join(REPO, "exps",
                                                      "fmr_convergence"))
    ap.add_argument("--data_dir", default=os.path.join(REPO, "datasets",
                                                       "human_views"))
    ap.add_argument("--train_count", type=int, default=48)
    ap.add_argument("--out", default=os.path.join(HERE, "FMR_ABLATIONS.json"))
    args = ap.parse_args(argv)

    import jax

    from a_robust_registration_loss_tpu.data import dataset as DS
    from a_robust_registration_loss_tpu.train import fmr as TF
    from a_robust_registration_loss_tpu.train import harness as H
    from a_robust_registration_loss_tpu.train import losses as L
    from a_robust_registration_loss_tpu.utils import CheckPointManager

    _, test_loader = DS.generate_datasets(DS.DatasetConfig(
        data_path=args.data_dir, layout="views", train_batch=4,
        seed=1234, fmr=True, train_count=args.train_count))
    batch0 = next(iter(test_loader))
    n_pts = batch0["points_src_sample"].shape[1]
    cfg = TF.FMRTrainConfig(
        loss=L.LossConfig(n_lines=15000),
        model=TF.FMRConfig(num_points=n_pts),
        fit=H.FitConfig(exp_dir=args.exp_dir),
    )
    model, optimizer, _, _, _ = TF.make_steps(cfg)
    params = TF.init_params(model, jax.random.PRNGKey(1234), batch0)
    ckpt = CheckPointManager(os.path.join(args.exp_dir, "checkpoints"))
    state, step = ckpt.load({"params": params,
                             "opt_state": optimizer.init(params),
                             "epoch": 0})
    if state is None:
        raise SystemExit(f"no checkpoint under {args.exp_dir}")
    params = state["params"]

    results = {"checkpoint_epoch": int(state["epoch"]),
               "n_test_pairs": len(test_loader), "modes": {}}
    for name, kw in (("clean", {}),
                     ("noise", {"add_noise": True}),
                     ("density", {"add_density": True})):
        dm = TF.evaluate(cfg, params, test_loader,
                         os.path.join(args.exp_dir, f"eval_{name}"),
                         log=lambda *a: None, seed=0, **kw)
        results["modes"][name] = {"mean_dm": float(dm)}
        print(f"{name}: mean dm = {dm:.6f}", flush=True)
    results["reference_protocol"] = "fmr/model.py:848-873 (FMRTest ablations)"
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
