#!/usr/bin/env python
"""Peak-HBM measurement for the metric backends — the memory north star.

BASELINE.md target: "no O(N^2)/O(L*N) HBM materialization" vs the
reference's >= 15 GB requirement (/root/reference/README.md:8). Round-3
verdict task 5: convert the claim from architecture-diagram to measurement.

For each (F points, L lines) problem and each backend this runs ONE
fwd+grad metric evaluation in a FRESH SUBPROCESS (so the device allocator's
peak is attributable to that program alone) and records
``device.memory_stats()['peak_bytes_in_use']``:

- ``pallas``: the fused stage-1 kernel streams (line-tile x face-tile)
  blocks through VMEM — expected peak O(L + F) (slot records + inputs).
- ``xla`` with line_chunk=4096: the chunked dense path — peak
  O(chunk * F).
- ``xla`` dense (line_chunk=None): the reference-shaped O(L * F)
  materialization; at F=16k x L=20k its stage-1 tensors are ~4 GB per
  (L, F) buffer and the program may simply OOM a 16 GB chip — recorded as
  "oom", which IS the reference's >= 15 GB failure mode.

Writes benchmarks/MEMORY.json.

Usage: python benchmarks/bench_memory.py [--points 5000,16384] [--lines 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CHILD = "_ARRL_MEM_CHILD"


def child(f_points: int, n_lines: int, backend: str, chunk):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/arrl_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M

    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    i = np.arange(f_points) + 0.5
    phi = np.arccos(1 - 2 * i / f_points)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1).astype(np.float32)

    # neighbor triples: the seed + 2 jittered copies — the metric only needs
    # the (F, 9) layout, not true 3-NN, for a memory measurement
    def neis(pts):
        a = pts
        b = pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.01
        c = pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.01
        return np.concatenate([a, b, c], -1)

    n1 = jnp.asarray(neis(p))
    n2 = jnp.asarray(neis(p + 0.02))
    lines = jax.jit(LN.sample_lines, static_argnums=3)(
        jax.random.PRNGKey(0), jnp.float32(2.2), jnp.zeros(3, jnp.float32),
        n_lines)
    jax.block_until_ready((n1, n2, lines))

    @jax.jit
    def run(t, a, b, ls):
        def loss_of(tt):
            return M.intersection_loss_rigid(
                jnp.eye(3, dtype=a.dtype), tt, a, b, ls,
                line_chunk=chunk, backend=backend)[0]

        return jax.value_and_grad(loss_of)(t)

    t_arg = jnp.full((3,), 0.01, jnp.float32)
    # XLA's own memory analysis of the compiled fwd+grad program: the
    # authoritative "what does this program materialize" number (the axon
    # plugin returns None from device.memory_stats(), and an allocator peak
    # would fold in caching noise anyway). temp = XLA's scratch for all
    # intermediates — the O(L*F) tensors land here.
    compiled = run.lower(t_arg, n1, n2, lines).compile()
    mem = compiled.memory_analysis()
    rec = {
        "temp_bytes": int(getattr(mem, "temp_size_in_bytes", -1)),
        "argument_bytes": int(getattr(mem, "argument_size_in_bytes", -1)),
        "output_bytes": int(getattr(mem, "output_size_in_bytes", -1)),
        "alias_bytes": int(getattr(mem, "alias_size_in_bytes", 0)),
    }
    rec["total_bytes"] = (rec["temp_bytes"] + rec["argument_bytes"]
                          + rec["output_bytes"] - rec["alias_bytes"])

    # also EXECUTE (unless the static analysis already exceeds the chip):
    # proves the program actually runs at this footprint
    limit = 15 * 2**30
    if rec["total_bytes"] < limit:
        loss, grad = compiled(t_arg, n1, n2, lines)
        jax.block_until_ready((loss, grad))
        rec["loss"] = float(loss)
        rec["finite"] = bool(jnp.isfinite(loss))
        rec["executed"] = True
    else:
        rec["executed"] = False
        rec["skip_reason"] = "static footprint exceeds chip HBM"
    stats = dev.memory_stats()
    if stats:
        rec["peak_bytes_in_use"] = int(stats.get("peak_bytes_in_use", -1))
    print(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="5000,16384")
    ap.add_argument("--lines", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out", default=os.path.join(HERE, "MEMORY.json"))
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    results = {"n_lines": args.lines, "chunk": args.chunk, "cases": []}
    for f_points in [int(x) for x in args.points.split(",")]:
        for backend, chunk in (("pallas", None), ("xla", args.chunk),
                               ("xla", None)):
            tag = (backend if chunk is None else f"{backend}-chunk{chunk}")
            env = dict(os.environ)
            env[CHILD] = json.dumps({
                "f_points": f_points, "n_lines": args.lines,
                "backend": backend, "chunk": chunk})
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=args.timeout)
            rec = {"f_points": f_points, "backend": tag}
            last = (proc.stdout.strip().splitlines() or [""])[-1]
            if proc.returncode == 0 and last.startswith("{"):
                got = json.loads(last)
                rec.update(got)
                rec["total_gib"] = round(got["total_bytes"] / 2**30, 3)
            else:
                err = (proc.stderr or "")[-2000:]
                rec["error"] = ("oom" if "RESOURCE_EXHAUSTED" in err
                                or "Out of memory" in err else err[-300:])
            results["cases"].append(rec)
            print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    if os.environ.get(CHILD):
        cfg = json.loads(os.environ[CHILD])
        child(cfg["f_points"], cfg["n_lines"], cfg["backend"], cfg["chunk"])
    else:
        main()
