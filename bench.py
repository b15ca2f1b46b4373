#!/usr/bin/env python
"""Headline benchmark: registration iters/sec at 2048-point pairs.

Measures the full classical-registration step — 20k-line rejection
resampling + intersected-line robust metric forward+grad + Adam — as one
jitted device program on the default backend (the real TPU chip under the
driver). Baseline: the reference's ~3.5 iters/sec (≈280 ms/step = Sam+Inter
at 20k lines from data/Computation_cost.png; see BASELINE.md).

Prints ONE JSON line:
{"metric": "registration_iters_per_sec_2048pts", "value": N,
 "unit": "iters/sec", "vs_baseline": N, ...extras}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_ITERS_PER_SEC = 3.5
N_POINTS = 2048
N_LINES = 20000
ITERS = 200   # per block; one same-shape block warms up, the second is timed


def _synthetic_pair(n=4096):
    rng = np.random.default_rng(0)
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1)
    p = (p * np.array([1.0, 0.7, 0.5])).astype(np.float32)
    v1 = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
    v2 = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
    return v1, v2


def _load_pair():
    """Reference sample pair when mounted AND large enough for a true
    N_POINTS-seed run (the committed challenge clouds have only 1,024
    vertices and sample_neighs silently caps num_sample at the cloud size —
    the round-1/2 headlines actually measured F=1024 under a 2048 label);
    synthetic blob otherwise."""
    base = "/root/reference/code/sample_data/challenge_data"
    try:
        from a_robust_registration_loss_tpu.data import objio

        v1, _ = objio.read_obj(os.path.join(base, "0_src_sample.obj"))
        v2, _ = objio.read_obj(os.path.join(base, "0_tar_sample.obj"))
        if min(len(v1), len(v2)) >= N_POINTS:
            return v1, v2
    except Exception:
        pass
    return _synthetic_pair()


def pallas_gate(data, n_lines: int = 1024, n_faces: int = 512):
    """On-hardware Pallas <-> XLA equivalence gate (round-1 VERDICT weak
    item 2): the unit suite checks the kernel only in interpret mode on CPU,
    and this platform has already miscompiled a vmapped gather once
    (ops/geometry.py workaround) — so before every recorded bench, assert on
    the REAL chip that the fused stage-1 kernel agrees with the XLA path:
    count/slot_idx exact, loss + gradient within 1e-4. Fails loudly (raises)
    so a silent Mosaic/axon miscompile can't produce a plausible-looking
    headline number or corrupt training runs."""
    import jax
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M

    # small shapes: remote compiles dominate gate cost, so ONE jitted
    # program per backend (stage-1 record + loss + grad together)
    n1, n2 = data["neis_src"][:n_faces], data["neis_tar"][:n_faces]
    lines = jax.jit(LN.resample_lines, static_argnums=3)(
        jax.random.PRNGKey(42), data["radius"], data["center"], n_lines,
        data["src"], data["tar"])

    out = {}
    for backend in ("xla", "pallas"):
        # n1/n2/lines as ARGS: closure-captured device arrays poison axon
        # dispatch pipelining process-wide (train/classical.py make_step) —
        # and the timed headline block runs in this same process
        @jax.jit
        def gate_fn(a, b, ls, t, _backend=backend):
            inter = M.find_intersections(a, ls, kmax=4, backend=_backend)

            def loss_of(tt):
                return M.intersection_loss_rigid(
                    jnp.eye(3, dtype=a.dtype), tt, a, b, ls,
                    backend=_backend)[0]

            loss, grad = jax.value_and_grad(loss_of)(t)
            return inter, loss, grad

        inter1, loss, grad = gate_fn(n1, n2, lines,
                                     jnp.full((3,), 0.01, n1.dtype))
        out[backend] = (jax.device_get(inter1), float(loss),
                        np.asarray(grad))

    # resample-kernel check: the fused candidate kernel must produce the
    # same candidate geometry as the XLA chain (trig ulps) and a matching
    # acceptance rate (labels are knife-edge rounding-determined on every
    # implementation — see ops/pallas/resample.py — so only the rate, not
    # the individual bits, is contractual)
    C = 10 * n_lines
    u4 = jax.random.uniform(jax.random.PRNGKey(7), (4, C))
    cand_x = jax.jit(LN.sample_lines, static_argnums=3)(
        jax.random.PRNGKey(7), data["radius"], data["center"], C)
    from a_robust_registration_loss_tpu.ops import geometry as G
    from a_robust_registration_loss_tpu.ops.pallas import resample as PR

    fvs1 = G.bbox_face_vertices(data["src"][None])[0]
    fvs2 = G.bbox_face_vertices(data["tar"][None])[0]
    ok_x = jax.jit(lambda f1, f2, c: (LN.triangle_hits(f1, c) > 0)
                   & (LN.triangle_hits(f2, c) > 0))(fvs1, fvs2, cand_x)
    cand_p, ok_p = PR.sample_and_hit(u4, data["radius"],
                                     jnp.asarray(data["center"]),
                                     PR.prep_faces(fvs1, fvs2))
    cand_p, ok_p, cand_x, ok_x = jax.device_get((cand_p, ok_p, cand_x, ok_x))
    resample_problems = []
    if not np.allclose(cand_p, cand_x, rtol=1e-4, atol=1e-4):
        resample_problems.append(
            f"resample candidate geometry mismatch "
            f"(max {np.abs(cand_p - cand_x).max():.2e})")
    ax, ap = float(ok_x.mean()), float(ok_p.mean())
    if abs(ax - ap) > 0.1 * max(ax, 1e-3):
        resample_problems.append(
            f"resample acceptance rate mismatch xla={ax:.4f} pallas={ap:.4f}")

    (ix, lx, gx), (ip_, lp, gp) = out["xla"], out["pallas"]
    problems = resample_problems
    if not np.array_equal(np.asarray(ix.count), np.asarray(ip_.count)):
        problems.append("stage1 count mismatch "
                        f"({int(np.sum(np.asarray(ix.count) != np.asarray(ip_.count)))} lines)")
    if not np.array_equal(np.asarray(ix.slot_idx), np.asarray(ip_.slot_idx)):
        problems.append("stage1 slot_idx mismatch")
    if not np.isfinite(lp) or abs(lp - lx) > 1e-4 * max(1.0, abs(lx)):
        problems.append(f"loss mismatch xla={lx} pallas={lp}")
    # gradient check: relative L2 error <= 5e-4 (component-wise rtol is the
    # wrong metric for a vector with small components). The pallas rigid
    # path recomputes the detached slot weights from the exact gathered
    # coordinates — same formula, ulp-level op-order differences vs the XLA
    # path's dense-tensor distances; since the exact masked median SELECTS
    # an element, an ulp shift can pick the neighboring order statistic and
    # move the (detached) Welsch scale — a legitimate ~1e-4 gradient
    # wiggle, while counts/slots stay exact and the loss stays within 1e-4.
    gerr = float(np.linalg.norm(gp - gx) / max(np.linalg.norm(gx), 1e-12))
    if not np.all(np.isfinite(gp)) or gerr > 5e-4:
        problems.append(f"grad mismatch (rel l2 {gerr:.2e}) xla={gx} pallas={gp}")
    if problems:
        print(json.dumps({"metric": "registration_iters_per_sec_2048pts",
                          "value": 0.0, "unit": "iters/sec",
                          "vs_baseline": 0.0,
                          "error": "PALLAS GATE FAILED: " + "; ".join(problems)}))
        raise SystemExit(1)


# --- chip peak assumptions for the roofline numbers (TPU v5 lite / v5e) ---
# MXU: 197 bf16 TFLOP/s (datasheet; == 4 MXUs x 128x128 x 2 FLOP @ ~1.5 GHz).
# VPU: (8, 128) lanes x 4 ALUs x ~1.5 GHz ~= 6.1 T scalar-op/s. The VPU
# figure is an architectural estimate (no published datasheet number); the
# roofline additionally anchors against measured_vpu_peak() below — a
# saturating FMA-chain microkernel run on THIS chip (round-4 verdict task 7).
VPU_PEAK_OPS = 8 * 128 * 4 * 1.5e9
MXU_PEAK_BF16 = 197e12


def measured_vpu_peak(iters: int = 512, unroll: int = 16, chains: int = 4,
                      rows: int = 128, cols: int = 1024, grid: int = 8):
    """Measured achievable VPU rate: a saturating logistic-map Pallas kernel
    with zero memory traffic inside the loop.

    Each grid step holds ``chains`` independent (rows, cols) fp32 blocks in
    VMEM and iterates x <- r*x*(1-x) (3 scalar ops/element, values bounded
    in (0,1)) ``iters * unroll`` times. The map is non-affine on a
    runtime-loaded r, so the compiler cannot algebraically collapse the
    chain (a plain FMA chain x<-a*x+b gets composed away under
    --xla_allow_excess_precision and measured an absurd 780 T ops/s);
    ``chains`` independent blocks provide the ILP to hide per-element
    latency. Sweep on the v5e chip (2026-08-20): 1.84-2.04 T ops/s plateau
    across iters/unroll/chains, linear in total work — the achievable VPU
    issue rate for this mul/sub mix is ~2 ops/lane/cycle, NOT the 4-ALU
    6.1 T architectural figure. Returns (ops_per_sec, ms_per_call).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        r = x_ref[0, 0] * 3.9   # runtime scalar: no constant folding

        def body(_, xs):
            for _ in range(unroll):
                xs = [r * x * (1.0 - x) for x in xs]
            return xs

        xs = [x_ref[...] * (0.1 + 0.2 * c) for c in range(chains)]
        xs = jax.lax.fori_loop(0, iters, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    x = jnp.ones((grid * rows, cols), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x))
    jax.block_until_ready(f(x))  # compile + warm
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000
    ops = 3.0 * iters * unroll * chains * rows * cols * grid
    return ops / (ms / 1000), ms


def stage1_op_counts(n_faces: int, n_lines: int, nnei: int = 3,
                     kmax: int = 4, tf: int = 128):
    """Counted per-iteration stage-1 work, BOTH clouds (verdict r4 task 4).

    VPU ops per (face, line) pair (ops/pallas/intersect.py:_kernel):
      per neighbor, per component: diff (1) + d_ac FMA (2) + proj FMA (2)
        = 5  -> 15 per neighbor;
      per neighbor: d2 = d_ac - proj*proj (2) + threshold compare (1)
        + label AND (1) = 4;
      per pair: hits float cast (1) + rank = csum - hits + carry (2)
        + rank_sel where (1) + kmax one-hot compares (kmax).
    Total = nnei*19 + 4 + kmax = 65 for (nnei=3, kmax=4).

    MXU FLOPs per pair: the rank prefix-sum matmul contracts a (tf, tf)
    triangular mask -> 2*tf bf16 FLOPs per output element; the kmax exact
    one-hot slot gathers contract (3*nnei+1, tf) @ (tf, tl) at HIGHEST
    (3-pass bf16) -> 3 * 2 * (3*nnei+1) * kmax per pair.
    """
    pairs = 2 * n_faces * n_lines   # both clouds
    vpu_per_pair = nnei * 19 + 4 + kmax
    mxu_per_pair = 2 * tf + 3 * 2 * (3 * nnei + 1) * kmax
    return pairs, pairs * vpu_per_pair, pairs * mxu_per_pair


def roofline(data, n_lines: int):
    """Measure the paired stage-1 dispatch alone and convert the counted
    FLOPs into achieved throughput + % of chip peak. Returns a dict merged
    into the headline JSON (recorded in BENCH_r{N}.json)."""
    import jax
    import jax.numpy as jnp

    from a_robust_registration_loss_tpu.ops import lines as LN
    from a_robust_registration_loss_tpu.ops import metric as M

    n1, n2 = data["neis_src"], data["neis_tar"]
    lines = jax.jit(LN.resample_lines, static_argnums=3)(
        jax.random.PRNGKey(3), data["radius"], data["center"], n_lines,
        data["src"], data["tar"])

    @jax.jit
    def stage1(a, b, ls, t):
        return M._rigid_slots_lanemajor(jnp.eye(3, dtype=a.dtype), t, a, b,
                                        ls, 4, False)

    t_arg = jnp.full((3,), 0.01, n1.dtype)
    out = stage1(n1, n2, lines, t_arg)   # compile + warm
    jax.block_until_ready(out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = stage1(n1, n2, lines, t_arg)
    jax.block_until_ready(out)
    stage1_ms = (time.perf_counter() - t0) / n * 1000

    F = int(np.asarray(n1).shape[0])
    pairs, vpu_ops, mxu_flops = stage1_op_counts(F, n_lines)
    vpu_rate = vpu_ops / (stage1_ms / 1000)
    mxu_rate = mxu_flops / (stage1_ms / 1000)
    vpu_meas, vpu_meas_ms = measured_vpu_peak()
    return {
        "stage1_ms": round(stage1_ms, 3),
        "stage1_pairs_per_iter": pairs,
        "stage1_vpu_gops_per_iter": round(vpu_ops / 1e9, 3),
        "stage1_mxu_gflops_per_iter": round(mxu_flops / 1e9, 3),
        "stage1_vpu_tops_per_sec": round(vpu_rate / 1e12, 3),
        "stage1_mxu_tflops_per_sec": round(mxu_rate / 1e12, 3),
        "pct_vpu_peak_assumed_6.1T": round(100 * vpu_rate / VPU_PEAK_OPS, 1),
        # denominator measured on THIS chip by the FMA-chain microkernel —
        # settles whether stage 1 sits at the achievable roofline or has
        # headroom the 6.1T architectural estimate hides
        "measured_vpu_peak_tops": round(vpu_meas / 1e12, 3),
        "measured_vpu_peak_kernel_ms": round(vpu_meas_ms, 3),
        "pct_vpu_peak_measured": round(100 * vpu_rate / vpu_meas, 1),
        "pct_mxu_peak_197T": round(100 * mxu_rate / MXU_PEAK_BF16, 1),
    }


def main():
    # Recording gate (round-4 verdict task 2): a headline benchmark implies
    # the reference-parity slow tier was green against THIS source. Refuse to
    # emit one when the committed stamp is stale, so a round can't ship a
    # recorded number on top of a red/unproven tree. ARRL_ALLOW_STALE=1
    # overrides for local experimentation only.
    from a_robust_registration_loss_tpu.utils.freshness import stamp_status

    status = stamp_status()
    if not status["fresh"] and os.environ.get("ARRL_ALLOW_STALE") != "1":
        print(json.dumps({
            "metric": "registration_iters_per_sec_2048pts",
            "value": None, "unit": "iters/sec", "vs_baseline": None,
            "error": "slow-tier stamp stale — refusing to record: "
                     + status["reason"]
                     + "; run `python -m pytest tests/ --runslow` green and "
                       "commit tests/.slow_tier_stamp.json",
            "stamp_time": status["stamp_time"],
        }))
        raise SystemExit(1)

    import jax

    # persistent compile cache: the gate + headline compile ~8 programs over
    # the tunnel (~3 min cold); repeat runs (driver rounds, local
    # re-recordings) skip them
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/arrl_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from a_robust_registration_loss_tpu.train import classical

    v1, v2 = _load_pair()
    cfg = classical.ClassicalConfig(
        n_lines=N_LINES, num_sample=N_POINTS, line_chunk=None,
        compute_chamfer=False, backend="pallas",
    )
    data = classical.prepare_pair(v1, v2, cfg)
    if jax.default_backend() not in ("cpu",):
        pallas_gate(data)
    optimizer = optax.adam(classical.lr_schedule(cfg))
    params = classical.init_twist(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = classical.make_step(cfg, data, optimizer)

    # measure the PRODUCTION path: classical.run drives blocks of epochs as
    # one scanned device program (train/classical.py:run_block) — a
    # per-step Python dispatch over the tunneled chip adds ~1.6 ms/step of
    # host gap that the real demo/training loop does not pay (profiler:
    # device compute is ~3.1 ms/step of the 4.7 ms per-dispatch wall)
    @jax.jit
    def run_block(carry, keys):
        return jax.lax.scan(step, carry, keys)

    carry = (params, opt_state, data["src"])
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * ITERS)

    # warmup block has the SAME shape as the timed one (a different key
    # count would compile a second program inside the timed region)
    carry, metrics = run_block(carry, keys[:ITERS])
    jax.block_until_ready(carry)

    t0 = time.perf_counter()
    carry, metrics = run_block(carry, keys[ITERS:])
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    metrics = {k: v[-1] for k, v in metrics.items()}

    roof = {}
    if jax.default_backend() not in ("cpu",):
        roof = roofline(data, N_LINES)

    iters_per_sec = ITERS / dt
    out = {
        "metric": "registration_iters_per_sec_2048pts",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
        "ms_per_iter": round(1000 * dt / ITERS, 3),
        "n_lines": N_LINES,
        "n_points": int(np.asarray(data["neis_src"]).shape[0]),  # actual F
        "backend": jax.default_backend(),
        "stage1": "pallas",
        "final_loss": float(metrics["loss"]),
        **roof,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
