"""Classical single-pair SE(3) optimization with the robust metric.

TPU-native re-design of the reference demo
(code/test_demo_optimized_Lie_Algebra.py): optimize a 6-DoF twist with Adam
so that the transformed source cloud's intersection metric against the target
is minimized. Everything — line resampling, the metric, Adam — runs inside a
single jitted, scanned device program; the reference's per-epoch host round
trips (`.nonzero()` selections, Python dict counters, obj dumps on the hot
path) do not exist here, which is where the >10x iters/sec comes from.

Semantics replicated from the reference:
- Twist init: random unit axis * 0.001 and 0.001 * N(0,1) translation
  (reference: loss.py:441-447), or a perturbed log of a given (R, t)
  (loss.py:449-453).
- Transform applied as points @ R + t via se3.exp3 (loss.py:455-463).
- Per epoch: resample 20k lines against the bboxes of the *previously*
  transformed source and the target (test_demo...py:47-53), radius = target
  bbox diagonal (test_demo...py:45), Adam lr 2e-2 halved every 1000 epochs
  *including epoch 0* (the reference's adjust_learning_rate halves at
  epoch % 1000 == 0, test_demo...py:15-21 — so the effective starting lr is
  1e-2; replicated).
- Chamfer distance logged as the independent check metric
  (test_demo...py:68-74).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.ops import lines as LN
from a_robust_registration_loss_tpu.ops import metric as M
from a_robust_registration_loss_tpu.se3 import se3


@dataclasses.dataclass(frozen=True)
class ClassicalConfig:
    n_epochs: int = 1000
    n_lines: int = 20000
    num_sample: int = 5000        # FPS seeds for neighborhoods (loss.py:473)
    lr: float = 2e-2              # test_demo...py:42
    lr_halve_every: int = 1000    # test_demo...py:18
    kmin: int = 1
    kmax: int = 4
    line_chunk: Optional[int] = 4096
    backend: str = "xla"          # "pallas" = fused TPU stage-1 kernel
    log_every: int = 10           # host fetch cadence (obj/scalar dumps)
    seed: int = 123               # test_demo...py:154
    compute_chamfer: bool = True


def init_twist(key, rotation=None, translation=None):
    """Twist init matching Reconstruction_point (reference: loss.py:438-453)."""
    if rotation is None or translation is None:
        k1, k2 = jax.random.split(key)
        axis = jax.random.normal(k1, (3,))
        axis = axis / jnp.linalg.norm(axis)
        trans = jax.random.normal(k2, (3,)) * 0.001
        return jnp.concatenate([0.001 * axis, trans]).astype(jnp.float32)
    g = jnp.zeros((4, 4), jnp.float32)
    g = g.at[:3, :3].set(rotation.reshape(3, 3))
    g = g.at[:3, 3].set(translation.reshape(3))
    g = g.at[3, 3].set(1.0)
    perturb = jax.random.uniform(key, (6,)) * 0.6
    return se3.log(g).reshape(-1) + perturb


def apply_twist(params, points, point_neis):
    """points @ R + t on the cloud and its flattened neighborhoods
    (reference: loss.py:455-463)."""
    R, t = se3.exp3(params.reshape(6))
    # precision: TPU default matmul is bf16 — the metric path pins fp32
    pts = jnp.matmul(points, R, precision=jax.lax.Precision.HIGHEST) + t
    neis = (jnp.matmul(point_neis.reshape(-1, 3), R,
                       precision=jax.lax.Precision.HIGHEST)
            + t).reshape(point_neis.shape)
    return pts, neis


def prepare_pair(src_vertices, tar_vertices, cfg: ClassicalConfig):
    """Device-side preprocessing mirroring the demo's main()
    (test_demo...py:103-141): FPS+3NN neighborhoods for both clouds, mean
    centering, target bbox radius. Returns a dict of device arrays."""
    src = jnp.asarray(src_vertices, jnp.float32)
    tar = jnp.asarray(tar_vertices, jnp.float32)
    neis_src = G.sample_neighs(src, cfg.num_sample, 3)
    neis_tar = G.sample_neighs(tar, cfg.num_sample, 3)
    c1 = src.mean(0, keepdims=True)
    c2 = tar.mean(0, keepdims=True)
    src, tar = src - c1, tar - c2
    neis_src = neis_src - c1
    neis_tar = neis_tar - c2
    bbox = G.bounding_box_corners(tar[None])[0]
    radius = jnp.linalg.norm(bbox[0] - bbox[-1])
    center = tar.mean(0)
    F = neis_src.shape[0] // 3
    return dict(
        src=src, tar=tar,
        neis_src=neis_src.reshape(F, 9),
        neis_tar=neis_tar.reshape(neis_tar.shape[0] // 3, 9),
        radius=radius, center=center,
        center_src=c1, center_tar=c2,
    )


def make_step(cfg: ClassicalConfig, data, optimizer):
    """Build the jitted single-epoch step.

    Carry: (params, opt_state, src_prev) where src_prev is the transformed
    source cloud from the previous epoch (used for the resampler's bbox,
    matching the reference's loop, test_demo...py:47-58).

    ``data`` is pulled to host numpy before the closure forms: compiling a
    jit that closure-captures a CONCRETE DEVICE array permanently breaks
    async dispatch pipelining for the whole process on the axon TPU plugin
    (every later dispatch — of ANY program — serializes at ~1 ms RTT;
    minimal repro in benchmarks/RESULTS.md). Numpy closure constants lower
    to HLO literals and are immune.
    """
    data_np = jax.device_get(data)

    def step(carry, key):
        # numpy -> jnp INSIDE the trace: constants lower as HLO literals
        # (poison-free) and downstream traced indexing stays on the jnp path
        data = jax.tree.map(jnp.asarray, data_np)
        tar = data["tar"]
        neis_tar = data["neis_tar"]
        params, opt_state, src_prev = carry
        lines = LN.resample_lines(
            key, data["radius"], data["center"], cfg.n_lines, src_prev, tar,
            backend=cfg.backend,
        )

        def loss_fn(p):
            R, t = se3.exp3(p.reshape(6))
            src_t = jnp.matmul(data["src"], R,
                               precision=jax.lax.Precision.HIGHEST) + t
            # gather-then-transform metric: same value/grad as transforming
            # the neighbor array first, without the backward scatter
            loss, valid = M.intersection_loss_rigid(
                R, t, data["neis_src"], neis_tar, lines, cfg.kmin, cfg.kmax,
                cfg.line_chunk, backend=cfg.backend,
            )
            return loss, (src_t, valid)

        (loss, (src_t, valid)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # reference skips the optimizer step entirely when the loss is missing
        # (test_demo...py:63-66); masked here: params, Adam moments and the
        # schedule step all stay frozen on an invalid epoch
        grads = jnp.where(valid, grads, 0.0)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jnp.where(valid, new_params, params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(valid, new, old), new_opt_state, opt_state
        )
        if cfg.compute_chamfer:
            chamfer = G.chamfer_distance(src_t[None], tar[None])
        else:
            chamfer = jnp.float32(0.0)
        metrics = dict(loss=loss, chamfer=chamfer, valid=valid)
        return (params, opt_state, src_t), metrics

    return step


def lr_schedule(cfg: ClassicalConfig):
    """2e-2 halved at every multiple of lr_halve_every INCLUDING step 0,
    replicating the reference quirk (test_demo...py:15-21)."""
    def fn(step):
        return cfg.lr * 0.5 ** (1 + step // cfg.lr_halve_every)
    return fn


def run(src_vertices, tar_vertices, cfg: ClassicalConfig = ClassicalConfig(),
        callback=None, init_params=None):
    """Full optimization. ``callback(epoch, params, metrics, src_transformed)``
    fires every cfg.log_every epochs (off the hot path). Returns
    (params, history dict of stacked per-epoch metrics)."""
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(key)
    data = prepare_pair(src_vertices, tar_vertices, cfg)
    params = init_twist(k_init) if init_params is None else jnp.asarray(init_params)
    optimizer = optax.adam(learning_rate=lr_schedule(cfg))
    opt_state = optimizer.init(params)
    step = make_step(cfg, data, optimizer)

    @jax.jit
    def run_block(carry, keys):
        return jax.lax.scan(step, carry, keys)

    carry = (params, opt_state, data["src"])
    history = []
    n_blocks = -(-cfg.n_epochs // cfg.log_every)
    all_keys = jax.random.split(k_run, cfg.n_epochs)
    done = 0
    pending = None
    for b in range(n_blocks):
        # the final block runs only the remaining epochs, so params and
        # history always reflect exactly cfg.n_epochs optimizer steps
        block = all_keys[done : min(done + cfg.log_every, cfg.n_epochs)]
        carry, metrics = run_block(carry, block)
        done += block.shape[0]
        # keep metrics on device: a per-block fetch is a host sync that costs
        # ~RTT over a tunneled TPU; everything is pulled once at the end
        history.append(metrics)
        if callback is not None:
            # fire the callback one block late so its device fetch overlaps
            # the next block's compute instead of serializing with it
            if pending is not None:
                _fire_callback(callback, pending)
            pending = (done, carry[0],
                       {k: v[-1] for k, v in metrics.items()}, carry[2])
    if pending is not None:
        _fire_callback(callback, pending)
    params = carry[0]
    history = jax.device_get(history)  # one batched sync for every block
    hist = {k: np.concatenate([h[k] for h in history]) for k in history[0]}
    return params, hist


def _fire_callback(callback, pending):
    """Materialize a deferred (epoch, params, last-metrics, src_t) tuple on
    the host and invoke the user callback.

    One batched ``jax.device_get`` on purpose: each individual fetch over a
    tunneled TPU costs a full round trip (~30 ms on a slow link), while
    device_get pipelines every transfer into one sync."""
    done, params_now, last, src_t = pending
    params_now, last, src_t = jax.device_get((params_now, last, src_t))
    callback(done, params_now, last, src_t)


def final_transform(params):
    """(R, t) of the optimized twist, plus the 3x4 matrix the reference dumps
    (test_demo...py:88-96).

    Pure numpy on purpose: the demo calls this from its periodic host
    callback, and eager jnp ops there dispatch ~30 tiny device programs per
    call — over a tunneled TPU that costs ~1.5 s per callback and silently
    capped the demo at ~50 it/s. Same math as se3.exp3 (Rodrigues + V, sinc
    Taylor branches), fp64, tested against it."""
    x = np.asarray(params, np.float64).reshape(6)
    w, v = x[:3], x[3:]
    t = float(np.linalg.norm(w))
    W = np.array([[0.0, -w[2], w[1]],
                  [w[2], 0.0, -w[0]],
                  [-w[1], w[0], 0.0]])
    S = W @ W
    if t < 0.01:  # the sinc Taylor cutoff (se3/sinc.py)
        t2 = t * t
        s1 = 1 - t2 / 6 * (1 - t2 / 20 * (1 - t2 / 42))
        s2 = 0.5 * (1 - t2 / 12 * (1 - t2 / 30 * (1 - t2 / 56)))
        s3 = (1 / 6) * (1 - t2 / 20 * (1 - t2 / 42 * (1 - t2 / 72)))
    else:
        s1 = np.sin(t) / t
        s2 = (1 - np.cos(t)) / (t * t)
        s3 = (t - np.sin(t)) / (t * t * t)
    I = np.eye(3)
    R = I + s1 * W + s2 * S
    V = I + s2 * W + s3 * S
    p = V @ v
    out = np.ones((3, 4), np.float64)
    out[:3, :3] = R
    out[:3, 3] = p
    return R.astype(np.float32), p.astype(np.float32), out


# ---------------------------------------------------------------------------
# Batched multi-pair registration — beyond the reference (which optimizes one
# pair per process, test_demo...py:158-162): vmap the whole epoch over a
# batch of pairs so a TPU chip amortizes the metric across registrations.
# Adam is elementwise, so per-pair moments ride along as (B, ...) arrays, and
# each pair's gradient depends only on its own twist row.
# ---------------------------------------------------------------------------

def prepare_pairs(src_batch, tar_batch, cfg: ClassicalConfig):
    """Batched prepare_pair: (B, N, 3) x (B, M, 3) -> dict of (B, ...)."""
    src = jnp.asarray(src_batch, jnp.float32)
    tar = jnp.asarray(tar_batch, jnp.float32)
    n = min(cfg.num_sample, src.shape[1], tar.shape[1])
    neis_src = G.sample_neighs(src, n, 3)
    neis_tar = G.sample_neighs(tar, n, 3)
    c1 = src.mean(1, keepdims=True)
    c2 = tar.mean(1, keepdims=True)
    src, tar = src - c1, tar - c2
    neis_src = neis_src - c1
    neis_tar = neis_tar - c2
    bbox = G.bounding_box_corners(tar)
    radius = jnp.linalg.norm(bbox[:, 0] - bbox[:, -1], axis=-1)
    B = src.shape[0]
    return dict(
        src=src, tar=tar,
        neis_src=neis_src.reshape(B, n, 9),
        neis_tar=neis_tar.reshape(B, n, 9),
        radius=radius, center=tar.mean(1),
        center_src=c1, center_tar=c2,
    )


def make_batch_step(cfg: ClassicalConfig, data, optimizer):
    """One jitted epoch over B pairs: per-pair line resampling, per-pair
    metric + Adam (masked on invalid pairs). Carry mirrors make_step with a
    leading batch axis. ``data`` goes to host numpy first — device-array
    closure constants poison axon dispatch pipelining (see make_step)."""
    data_np = jax.device_get(data)

    def step(carry, key):
        data = jax.tree.map(jnp.asarray, data_np)  # HLO literals, see make_step
        tar = data["tar"]
        neis_tar = data["neis_tar"]
        params, opt_state, src_prev = carry  # (B, 6), ..., (B, N, 3)
        B = params.shape[0]
        keys = jax.random.split(key, B)
        lines = jax.vmap(
            lambda k, r, c, s, t: LN.resample_lines(k, r, c, cfg.n_lines, s, t,
                                                    backend=cfg.backend)
        )(keys, data["radius"], data["center"], src_prev, tar)

        def loss_fn(ps):
            def per_pair(p, n1, n2, l):
                R, t = se3.exp3(p.reshape(6))
                loss, valid = M.intersection_loss_rigid(
                    R, t, n1, n2, l, cfg.kmin, cfg.kmax,
                    cfg.line_chunk, backend=cfg.backend,
                )
                return jnp.where(valid, loss, 0.0), valid

            losses, valids = jax.vmap(per_pair)(ps, data["neis_src"],
                                                neis_tar, lines)
            return losses.sum(), (losses, valids)

        (_, (losses, valids)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jnp.where(valids[:, None], grads, 0.0)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jnp.where(valids[:, None], new_params, params)

        def mask_state(new, old):
            # per-pair freeze for (B, ...) moments; the shared schedule count
            # (a scalar) only freezes when every pair was invalid
            if new.ndim >= 1 and new.shape[0] == valids.shape[0]:
                m = valids.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)
            return jnp.where(valids.any(), new, old)

        opt_state = jax.tree.map(mask_state, new_opt_state, opt_state)

        def one_transform(p, s):
            R, t = se3.exp3(p.reshape(6))
            return jnp.matmul(s, R, precision=jax.lax.Precision.HIGHEST) + t

        src_t = jax.vmap(one_transform)(params, data["src"])
        if cfg.compute_chamfer:
            chamfer = jax.vmap(
                lambda a, b: G.chamfer_distance(a[None], b[None])
            )(src_t, tar)
        else:
            chamfer = jnp.zeros(B, jnp.float32)
        return (params, opt_state, src_t), dict(
            loss=losses, chamfer=chamfer, valid=valids)

    return step


def run_batch(src_batch, tar_batch, cfg: ClassicalConfig = ClassicalConfig(),
              callback=None, init_params=None):
    """Optimize B registrations simultaneously. src_batch/tar_batch:
    (B, N, 3)/(B, M, 3) (equal counts within each batch). Returns
    (params (B, 6), history of (n_epochs, B) metric arrays)."""
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(key)
    data = prepare_pairs(src_batch, tar_batch, cfg)
    B = data["src"].shape[0]
    if init_params is None:
        params = jax.vmap(init_twist)(jax.random.split(k_init, B))
    else:
        params = jnp.asarray(init_params)
    optimizer = optax.adam(learning_rate=lr_schedule(cfg))
    opt_state = optimizer.init(params)
    step = make_batch_step(cfg, data, optimizer)

    @jax.jit
    def run_block(carry, keys):
        return jax.lax.scan(step, carry, keys)

    carry = (params, opt_state, data["src"])
    history = []
    all_keys = jax.random.split(k_run, cfg.n_epochs)
    done = 0
    n_blocks = -(-cfg.n_epochs // cfg.log_every)
    pending = None
    for b in range(n_blocks):
        block = all_keys[done : min(done + cfg.log_every, cfg.n_epochs)]
        carry, metrics = run_block(carry, block)
        done += block.shape[0]
        history.append(metrics)  # device refs; fetched once at the end
        if callback is not None:
            if pending is not None:
                _fire_callback(callback, pending)
            pending = (done, carry[0],
                       {k: v[-1] for k, v in metrics.items()}, carry[2])
    if pending is not None:
        _fire_callback(callback, pending)
    history = jax.device_get(history)  # one batched sync for every block
    hist = {k: np.concatenate([h[k] for h in history]) for k in history[0]}
    return carry[0], hist
