"""The metric-vs-chamfer study: reproduce the reference's qualitative claim.

The reference's More_about_our_metrics/Visualized_our_metrics.md:1-11 states,
with two figures, that during optimization of the intersected-line metric
(1) chamfer distance does NOT decrease monotonically, and (2) the optimum of
the metric does not coincide with the minimal chamfer distance — i.e. the
metric is essentially different from chamfer.

This script re-runs that experiment on the committed sample pair: optimize a
single registration with the metric (the classical demo path), record BOTH
curves per step, and quantify the claim:

- ``cd_increase_steps``: number of steps where CD rises (raw count — both
  implementations resample lines stochastically each step, exactly like
  the reference's own curve);
- ``cd_increase_steps_smoothed``: CD rises of the 10-step moving average —
  non-monotonicity that survives smoothing out per-step resampling noise
  (the stronger form of the claim);
- ``argmin_cd_step`` vs ``final_step``: the CD optimum is not the endpoint;
- ``cd_at_argmin_metric`` vs ``min_cd``: the metric's optimum does not
  minimize CD.

Writes benchmarks/METRIC_VS_CHAMFER.json (+ curves for plotting).

Usage: python benchmarks/metric_vs_chamfer.py [--epochs 600] [--label 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SAMPLE = "/root/reference/code/sample_data/airplane_data"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=SAMPLE)
    ap.add_argument("--label", default="0")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--n_lines", type=int, default=2000)
    ap.add_argument("--num_sample", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. cpu) — the axon TPU "
                         "plugin ignores the JAX_PLATFORMS env var")
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "METRIC_VS_CHAMFER.json"))
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.train import classical as C

    if args.backend == "auto":
        args.backend = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                        else "xla")
    src, _ = objio.read_obj(
        os.path.join(args.data_dir, f"{args.label}_src_sample.obj"))
    tar, _ = objio.read_obj(
        os.path.join(args.data_dir, f"{args.label}_tar_sample.obj"))
    cfg = C.ClassicalConfig(
        n_epochs=args.epochs, n_lines=args.n_lines,
        num_sample=args.num_sample, seed=args.seed, backend=args.backend,
        compute_chamfer=True,
    )
    _, hist = C.run(src, tar, cfg)
    loss = np.asarray(hist["loss"], np.float64)
    cd = np.asarray(hist["chamfer"], np.float64)

    d_cd = np.diff(cd)
    # 10-step moving average: non-monotonicity beyond resampling noise
    w = 10
    cd_s = np.convolve(cd, np.ones(w) / w, mode="valid")
    d_cd_s = np.diff(cd_s)
    result = {
        "config": {"label": args.label, "epochs": args.epochs,
                   "n_lines": args.n_lines, "num_sample": args.num_sample,
                   "backend": args.backend, "seed": args.seed},
        "final_step": int(len(cd) - 1),
        "argmin_cd_step": int(np.argmin(cd)),
        "argmin_metric_step": int(np.argmin(loss)),
        "min_cd": float(np.min(cd)),
        "final_cd": float(cd[-1]),
        "cd_at_argmin_metric": float(cd[np.argmin(loss)]),
        "cd_increase_steps": int(np.sum(d_cd > 0)),
        "cd_increase_fraction": float(np.mean(d_cd > 0)),
        "cd_increase_steps_smoothed": int(np.sum(d_cd_s > 0)),
        "cd_increase_fraction_smoothed": float(np.mean(d_cd_s > 0)),
        "metric_first": float(loss[0]), "metric_last": float(loss[-1]),
        "cd_first": float(cd[0]), "cd_last": float(cd[-1]),
        "curves": {"metric": loss.tolist(), "chamfer": cd.tolist()},
        "reference_claim": {
            "source": "More_about_our_metrics/Visualized_our_metrics.md:1-11",
            "cd_non_monotone": True,
            "metric_optimum_not_cd_optimum": True,
        },
    }
    # the two qualitative claims, evaluated on this run (the non-monotone
    # claim on the SMOOTHED curve so per-step resampling noise can't
    # trivially satisfy it)
    result["claims_hold"] = {
        "cd_non_monotone": bool(result["cd_increase_steps_smoothed"] > 0),
        "metric_optimum_not_cd_optimum": bool(
            result["argmin_cd_step"] != result["argmin_metric_step"]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    brief = {k: v for k, v in result.items() if k != "curves"}
    print(json.dumps(brief, indent=1))


if __name__ == "__main__":
    main()
