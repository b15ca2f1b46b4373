#!/usr/bin/env python
"""Single-pair classical registration demo — the TPU-native equivalent of the
reference's code/test_demo_optimized_Lie_Algebra.py.

Loads {label}_src_sample.obj / {label}_tar_sample.obj, optimizes a 6-DoF
twist with Adam against the intersected-line robust metric, and dumps the
transformed cloud / target / 3x4 transform every --log_every epochs, with the
chamfer distance printed as the independent check metric.

Usage (matches the reference's flags, test_demo...py:149-157):
    python demo.py --data_path /root/reference/code/sample_data/challenge_data \
                   --label1 0 --Save_path ./results/0challenge
"""

import argparse
import os
import time

import numpy as np


def main_batch(args):
    """Batched mode: register every pair in --labels simultaneously in one
    jitted program (beyond the reference, which loops labels one process at
    a time, test_demo...py:158-162)."""
    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.train import classical

    labels = args.labels.split(",")
    srcs, tars = [], []
    for lb in labels:
        v1, _ = objio.read_obj(os.path.join(args.data_path, f"{lb}_src_sample.obj"))
        v2, _ = objio.read_obj(os.path.join(args.data_path, f"{lb}_tar_sample.obj"))
        srcs.append(v1)
        tars.append(v2)
    src_b = np.stack(srcs)
    tar_b = np.stack(tars)
    cfg = classical.ClassicalConfig(
        n_epochs=args.n_epochs, n_lines=args.n_lines,
        num_sample=args.num_sample, seed=args.seed,
        log_every=args.log_every, backend=args.backend,
        line_chunk=None if args.line_chunk <= 0 else args.line_chunk)
    os.makedirs(args.Save_path, exist_ok=True)
    t0 = time.perf_counter()
    state = {"t1": None, "e1": 0}

    def callback(epoch, params, metrics, src_t):
        if state["t1"] is None:
            state["t1"] = time.perf_counter()  # after first jit
            state["e1"] = epoch
        print(f"epoch {epoch:5d}  chamfer " +
              " ".join(f"{c:.4f}" for c in metrics["chamfer"]))

    params, hist = classical.run_batch(src_b, tar_b, cfg, callback=callback)
    dt = time.perf_counter() - t0
    steady = time.perf_counter() - (state["t1"] or t0)
    steady_epochs = args.n_epochs - state["e1"]
    for j, lb in enumerate(labels):
        _, _, transform = classical.final_transform(params[j])
        np.savetxt(os.path.join(args.Save_path, f"{lb}_transform.txt"),
                   transform)
    print(f"{len(labels)} pairs x {args.n_epochs} epochs in {dt:.1f}s; "
          f"steady-state {len(labels) * steady_epochs / steady:.1f} pair-iters/sec")
    print("final chamfers:", " ".join(f"{c:.4f}" for c in hist["chamfer"][-1]))
    return hist


def main(args):
    from a_robust_registration_loss_tpu.data import objio
    from a_robust_registration_loss_tpu.train import classical

    src_path = os.path.join(args.data_path, args.label1 + "_src_sample.obj")
    tar_path = os.path.join(args.data_path, args.label1 + "_tar_sample.obj")
    v1, _ = objio.read_obj(src_path)
    v2, _ = objio.read_obj(tar_path)

    cfg = classical.ClassicalConfig(
        n_epochs=args.n_epochs,
        n_lines=args.n_lines,
        num_sample=args.num_sample,
        seed=args.seed,
        log_every=args.log_every,
        line_chunk=None if args.line_chunk <= 0 else args.line_chunk,
        backend=args.backend,
    )
    os.makedirs(args.Save_path, exist_ok=True)
    t0 = time.perf_counter()
    state = {"epochs_done": 0, "t_start": None}

    def callback(epoch, params, metrics, src_t):
        if state["t_start"] is None:
            state["t_start"] = time.perf_counter()  # after first jit
            state["epochs_at_start"] = epoch
        print(
            f"epoch {epoch:5d}  chamfer {float(metrics['chamfer']):.6f}  "
            f"intersection {float(metrics['loss']):.6f}"
        )
        objio.write_obj(os.path.join(args.Save_path, f"{epoch}.obj"), src_t)
        _, _, transform = classical.final_transform(params)
        np.savetxt(os.path.join(args.Save_path, f"{epoch}_transform.txt"), transform)
        state["epochs_done"] = epoch

    params, hist = classical.run(v1, v2, cfg, callback=callback)
    objio.write_obj(os.path.join(args.Save_path, "target.obj"),
                    np.asarray(v2) - v2.mean(0, keepdims=True))
    # final colored-ply + PNG overlay of the registration (headless
    # equivalent of the reference's open3d eval viewer)
    from a_robust_registration_loss_tpu.utils import viz

    _, _, t34 = classical.final_transform(params)
    g = np.eye(4)
    # final_transform is row-convention (p @ R + t); draw_... applies column
    g[:3, :3] = t34[:, :3].T
    g[:3, 3] = t34[:, 3]
    viz.draw_registration_result(
        np.asarray(v1) - v1.mean(0, keepdims=True),
        np.asarray(v2) - v2.mean(0, keepdims=True), g, args.Save_path)
    elapsed = time.perf_counter() - (state["t_start"] or t0)
    steady_epochs = state["epochs_done"] - state.get("epochs_at_start", 0)
    if steady_epochs > 0:
        print(f"steady-state: {steady_epochs / elapsed:.2f} iters/sec")
    print(f"final chamfer {hist['chamfer'][-1]:.6f}  "
          f"intersection {hist['loss'][-1]:.6f}")
    return hist


def cli(argv=None):
    """Console entry (`arrl-demo`); argv defaults to sys.argv[1:]."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str,
                        default="/root/reference/code/sample_data/challenge_data")
    parser.add_argument("--label1", type=str, default="0")
    parser.add_argument("--Save_path", type=str, default="./results/demo")
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--n_epochs", type=int, default=1000)
    parser.add_argument("--n_lines", type=int, default=20000)
    parser.add_argument("--num_sample", type=int, default=5000)
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--line_chunk", type=int, default=4096)
    parser.add_argument("--backend", type=str, default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="auto = pallas on TPU, xla elsewhere")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu) — the axon "
                             "TPU plugin ignores the JAX_PLATFORMS env var")
    parser.add_argument("--labels", type=str, default=None,
                        help="comma-separated labels for BATCHED multi-pair "
                             "registration (one jitted program)")
    _args = parser.parse_args(argv)
    import jax

    from a_robust_registration_loss_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    if _args.platform:
        jax.config.update("jax_platforms", _args.platform)
    if _args.backend == "auto":
        _args.backend = ("pallas"
                         if jax.devices()[0].platform not in ("cpu",)
                         else "xla")
    if _args.labels:
        main_batch(_args)
    else:
        main(_args)



if __name__ == "__main__":
    cli()
