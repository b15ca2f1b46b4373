#!/usr/bin/env python
"""Large-N end-to-end artifact (BASELINE config 5's regime; round-2 verdict
task 4): a full classical registration of a synthetic 16,384-point pair —
a scale the reference cannot evaluate at all on a 15 GB GPU (its stage-1
tensor alone would be 20000 x 16384 x 3 floats = 3.9 GB per cloud per
replica; its published Computation_cost table stops at 10k points).

Writes benchmarks/LARGE_N.json:
  - steady-state steps/sec (post-compile, device-bound),
  - final rotation/translation error vs the known synthetic ground truth,
  - the chamfer curve (every 10th epoch),
  - an sp-sharded dryrun on the 8-virtual-CPU mesh recording the per-device
    line shard shapes (large-N is the stated purpose of line-axis sharding).

tests/test_training_artifact.py::TestLargeN holds the endpoints to bars.

Usage:
  python benchmarks/bench_large_n.py                # full artifact (TPU)
  python benchmarks/bench_large_n.py --sp_only      # just the sp dryrun
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "LARGE_N.json")

N_POINTS = 16384
ROT_DEG = 25.0


def synthetic_pair(n=N_POINTS, seed=0):
    """A radially-modulated sphere (asymmetric, registration-determined) and
    its copy under a known ~25 deg rotation + translation."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    th = np.pi * (1 + 5**0.5) * i
    p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                  np.cos(phi)], -1)
    r = 1.0 + 0.25 * np.sin(3 * phi) * np.cos(2 * th) + 0.1 * np.cos(5 * th)
    rng = np.random.default_rng(seed)
    src = (p * r[:, None] + rng.standard_normal(p.shape) * 0.002)

    ang = np.deg2rad(ROT_DEG)
    axis = np.array([0.3, 0.8, 0.52])
    axis /= np.linalg.norm(axis)
    W = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    Rg = np.eye(3) + np.sin(ang) * W + (1 - np.cos(ang)) * (W @ W)
    Tg = np.array([0.15, -0.1, 0.2])
    tar = src @ Rg + Tg
    return src.astype(np.float32), tar.astype(np.float32), Rg, Tg


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def run_main(args):
    import jax

    from a_robust_registration_loss_tpu.train import classical

    platform = jax.devices()[0].platform
    backend = "pallas" if platform not in ("cpu",) else "xla"
    src, tar, Rg, Tg = synthetic_pair()
    cfg = classical.ClassicalConfig(
        n_epochs=args.epochs, n_lines=args.n_lines, num_sample=5000,
        log_every=50, backend=backend, line_chunk=None, seed=123)

    state = {"t1": None, "e1": 0}

    def callback(epoch, params, metrics, src_t):
        if state["t1"] is None:
            state["t1"] = time.perf_counter()
            state["e1"] = epoch
        print(f"epoch {epoch:4d} chamfer {float(metrics['chamfer']):.6f} "
              f"loss {float(metrics['loss']):.6f}")

    t0 = time.perf_counter()
    params, hist = classical.run(src, tar, cfg, callback=callback)
    wall = time.perf_counter() - t0
    steady = time.perf_counter() - state["t1"]
    steady_epochs = args.epochs - state["e1"]
    steps_per_sec = steady_epochs / steady if steady_epochs > 0 else None

    R, t, _ = classical.final_transform(params)
    rot_err = rot_angle_deg(R, Rg)
    # centered-frame GT translation: c_src @ Rg + Tg - c_tar maps to 0
    t_gt = (src.mean(0) @ Rg + Tg) - tar.mean(0)
    trans_err = float(np.linalg.norm(np.asarray(t, np.float64) - t_gt))
    chamfer = np.asarray(hist["chamfer"], np.float64)

    return {
        "protocol": f"classical registration, synthetic {N_POINTS}-pt pair, "
                    f"{ROT_DEG} deg rotation, {args.epochs} epochs x "
                    f"{args.n_lines} lines, num_sample 5000, backend "
                    f"{backend}",
        "platform": platform,
        "n_points": N_POINTS,
        "n_lines": args.n_lines,
        "epochs": args.epochs,
        "steps_per_sec": steps_per_sec,
        "wall_s": wall,
        "final_rot_err_deg": rot_err,
        "final_trans_err": trans_err,
        "chamfer_first": float(chamfer[0]),
        "chamfer_final": float(chamfer[-1]),
        "chamfer_curve_every10": chamfer[::10].tolist(),
    }


def run_sp_dryrun(args):
    """Line-parallel (sp=8) execution of the same large-N metric step on the
    8-virtual-CPU mesh: records per-device line shard shapes and per-step
    losses. Must be invoked in a fresh process (--sp_only) so the virtual
    device count takes effect before jax initializes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    from a_robust_registration_loss_tpu.parallel import mesh as pmesh
    from a_robust_registration_loss_tpu.se3 import se3
    from a_robust_registration_loss_tpu.train import classical
    from a_robust_registration_loss_tpu.train import losses as L

    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = pmesh.make_mesh(dp=1, sp=8)
    src, tar, _, _ = synthetic_pair()
    cfg = classical.ClassicalConfig(n_lines=args.n_lines, num_sample=5000,
                                    backend="xla", line_chunk=None)
    data = classical.prepare_pairs(src[None], tar[None], cfg)
    lcfg = L.LossConfig(n_lines=args.n_lines, backend="xla", mesh=mesh,
                        line_chunk=None)

    params = classical.init_twist(jax.random.PRNGKey(0))[None]
    optimizer = optax.adam(2e-2)
    opt_state = optimizer.init(params)
    tar_box = jnp.stack([jnp.stack([data["tar"][0].min(0),
                                    data["tar"][0].max(0)])])

    def step(params, opt_state, key):
        def loss_fn(p):
            R, t = jax.vmap(se3.exp3)(p)
            pred_src = jnp.einsum("bnj,bjk->bnk", data["src"], R) + t[:, None]
            lines = L.batch_lines(key, tar_box, data["center"], lcfg.n_lines,
                                  pred_src, data["tar"], radius_scale=1.0,
                                  mesh=mesh, backend="xla")
            # row-convention p @ R + t == rigid path's R_row
            per = L._metric_batch_rt(R, t, data["neis_src"],
                                     data["neis_tar"], lines, lcfg)
            return jnp.sum(per), lines

        (loss, lines), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, lines

    with mesh:
        jstep = jax.jit(step)
        losses = []
        shard_shapes = None
        key = jax.random.PRNGKey(5)
        for i in range(args.sp_steps):
            key, sub = jax.random.split(key)
            params, opt_state, loss, lines = jstep(params, opt_state, sub)
            losses.append(float(loss))
            if shard_shapes is None:
                shard_shapes = sorted(
                    {tuple(s.data.shape) for s in lines.addressable_shards})
    assert all(np.isfinite(losses)), losses
    return {
        "mesh": {"dp": 1, "sp": 8},
        "devices": n_dev,
        "n_points": N_POINTS,
        "n_lines": args.n_lines,
        "line_buffer_shape": [1, args.n_lines, 6],
        "per_device_line_shard_shapes": [list(s) for s in shard_shapes],
        "losses": losses,
        "steps": args.sp_steps,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--n_lines", type=int, default=20000)
    ap.add_argument("--sp_steps", type=int, default=2)
    ap.add_argument("--sp_only", action="store_true")
    ap.add_argument("--skip_sp", action="store_true")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)

    if args.sp_only:
        os.environ.setdefault("XLA_FLAGS", "")
        out = run_sp_dryrun(args)
        print(json.dumps(out))
        return

    art = run_main(args)
    if not args.skip_sp:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sp_only",
             "--n_lines", str(args.n_lines), "--sp_steps", str(args.sp_steps)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(HERE))
        if proc.returncode != 0:
            raise RuntimeError(f"sp dryrun failed:\n{proc.stdout}\n{proc.stderr}")
        art["sp_dryrun"] = json.loads(proc.stdout.strip().splitlines()[-1])
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}: {art['steps_per_sec']:.1f} steps/s, "
          f"rot err {art['final_rot_err_deg']:.3f} deg")


if __name__ == "__main__":
    main()
