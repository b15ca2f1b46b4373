#!/usr/bin/env python
"""Committed micro-repro of the axon dispatch-pipelining poison.

Round-2 discovery (benchmarks/RESULTS.md "Axon dispatch-pipelining
poison"), previously summarized in prose: compiling ANY jit whose closure
captures a concrete DEVICE array permanently serializes async dispatch for
the whole process — every subsequent dispatch pays a ~1 ms RTT floor,
regardless of program. The fix used throughout this repo: pass device data
as jit ARGS, or convert closure constants to host numpy (HLO literals)
first (train/classical.py make_step note).

This driver measures, in TWO fresh subprocesses on the real chip:
  clean   — N dispatches of a tiny jitted program with data as ARGS;
  poisoned— same program and data, but AFTER compiling one unrelated jit
            that closure-captures a device array.
and records per-dispatch wall in benchmarks/DISPATCH_POISON.json. On an
unaffected platform the two match; under the axon tunnel the poisoned
per-dispatch wall jumps to the RTT floor.

Usage: python benchmarks/dispatch_poison_repro.py [--n 300]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CHILD = "_ARRL_POISON_CHILD"


def child(mode: str, n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (256, 256)).astype(np.float32))

    if mode == "poisoned":
        captured = jnp.asarray(np.ones((8, 8), np.float32))  # DEVICE array

        @jax.jit
        def poison():
            return captured.sum()

        poison().block_until_ready()

    @jax.jit
    def step(a):
        return (a @ a).sum()

    step(x).block_until_ready()  # compile outside the timed region

    # async-dispatch probe: issue n dispatches back-to-back, sync once.
    # With pipelining intact the wall is ~device time; with dispatch
    # serialized each call pays the tunnel RTT.
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step(x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode,
                      "per_dispatch_ms": round(1000 * dt / n, 4)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "DISPATCH_POISON.json"))
    args = ap.parse_args()

    recs = {}
    for mode in ("clean", "poisoned"):
        env = dict(os.environ)
        env[CHILD] = json.dumps({"mode": mode, "n": args.n})
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=900)
        last = (proc.stdout.strip().splitlines() or [""])[-1]
        if proc.returncode != 0 or not last.startswith("{"):
            raise SystemExit(f"{mode} child failed:\n{proc.stderr[-1500:]}")
        recs[mode] = json.loads(last)
        print(last, flush=True)

    recs["slowdown_x"] = round(
        recs["poisoned"]["per_dispatch_ms"] / recs["clean"]["per_dispatch_ms"],
        2)
    import jax

    recs["device"] = str(jax.devices()[0])
    recs["n_dispatches"] = args.n
    with open(args.out, "w") as f:
        json.dump(recs, f, indent=1)
    print(f"wrote {args.out} (slowdown {recs['slowdown_x']}x)")


if __name__ == "__main__":
    if os.environ.get(CHILD):
        cfg = json.loads(os.environ[CHILD])
        child(cfg["mode"], cfg["n"])
    else:
        main()
