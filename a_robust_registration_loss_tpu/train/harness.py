"""Shared training-harness scaffolding for the model zoo.

The reference's three harnesses (Train_DCP.py, Train_RPM.py, Train_FMR.py)
each hand-roll the same epoch loop: iterate a loader, backward, step, print,
write TB scalars, dump obj artifacts, checkpoint best/periodic. Here that
loop is one place, built TPU-first:

- the train/eval steps are **jitted once** and take (params, opt_state,
  batch, key) — all data-dependent work stays on device; host work
  (logging, obj dumps, checkpoints) happens on fetched copies every k steps,
  off the hot path;
- optional batch data-parallelism: pass a mesh and the harness device_puts
  each batch with a dp sharding — XLA inserts the gradient psums (SURVEY.md
  §2.7; the reference's only parallelism is nn.DataParallel,
  dcp/Train_DCP.py:875-877);
- checkpointing via utils.CheckPointManager (orbax), metrics via
  utils.MetricsWriter (JSONL + TB when available).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from a_robust_registration_loss_tpu.data import objio
from a_robust_registration_loss_tpu.utils import CheckPointManager, MetricsWriter

# metrics keys aggregated by SUM over an epoch instead of the mean (event
# counters; everything else is a per-batch average)
COUNTER_KEYS = frozenset({"nonfinite_steps"})


def guarded_update(optimizer, grads, opt_state, params, loss):
    """Optimizer update that SKIPS the step when the loss or any gradient is
    non-finite, so one poisoned batch cannot corrupt the Adam moments.

    The metric's replicated welsch(0, 0) quirk (ops/metric.py docstring: a
    batch whose distance median is exactly 0 yields 0/0 = NaN, faithful to
    the reference loss.py:20-21) would otherwise flow NaN through
    optimizer.update into mu/nu and poison every subsequent step. The
    reference handles this by crashing the process (loss.py:89-91); our
    no-process-exit policy freezes the step instead, exactly like the
    classical path's masked freeze (train/classical.py), and surfaces it as
    a counted ``nonfinite_steps`` monitor (summed per epoch, COUNTER_KEYS).

    Returns (params, opt_state, nonfinite_flag) where the flag is 1.0 for a
    skipped step, 0.0 otherwise.
    """
    finite = jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        finite = finite & jnp.all(jnp.isfinite(leaf))
    updates, new_opt = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    def sel(new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), new, old)

    return (sel(new_params, params), sel(new_opt, opt_state),
            (~finite).astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class FitConfig:
    epochs: int = 10
    exp_dir: str = "./exps/run"
    save_every: int = 1            # checkpoint cadence (epochs)
    artifacts_every: int = 0       # obj dump cadence (0 = off)
    max_to_keep: int = 5           # rpm/common/torch.py:41
    keep_every_n_hours: float = 6.0
    seed: int = 1234
    resume: bool = True            # reload-latest (rpm/Train_RPM.py:453-464)
    log_tensorboard: bool = True
    async_checkpoints: bool = True  # orbax async save off the epoch loop


def dump_registration_objs(directory: str, tag, src, pred, tar, gt_src=None):
    """Periodic artifact dumps of one sample (reference:
    rpm/Train_RPM.py:85-139 save_results, dcp/Train_DCP.py:510-517)."""
    os.makedirs(directory, exist_ok=True)
    objio.write_obj(os.path.join(directory, f"{tag}_src.obj"), np.asarray(src))
    objio.write_obj(os.path.join(directory, f"{tag}_pred_src.obj"),
                    np.asarray(pred))
    objio.write_obj(os.path.join(directory, f"{tag}_tar.obj"), np.asarray(tar))
    if gt_src is not None:
        objio.write_obj(os.path.join(directory, f"{tag}_gt_src.obj"),
                        np.asarray(gt_src))


class Trainer:
    """Generic fit loop around jitted step functions.

    train_step(params, opt_state, batch, key) -> (params, opt_state, metrics)
    eval_step(params, batch, key) -> metrics  (must contain score_key)
    artifact_fn(params, batch, key) -> (src, pred, tar, gt_src) one sample
    """

    def __init__(self, train_step: Callable, eval_step: Optional[Callable],
                 cfg: FitConfig, score_key: str = "loss",
                 score_mode: str = "min",
                 artifact_fn: Optional[Callable] = None,
                 mesh=None):
        self._train_step_raw = train_step
        self._eval_step_raw = eval_step
        self.train_step = jax.jit(train_step)
        self.eval_step = jax.jit(eval_step) if eval_step is not None else None
        self._train_epoch_jit = None   # scanned-epoch programs, built lazily
        self._eval_epoch_jit = None
        self.cfg = cfg
        self.score_key = score_key
        self.score_mode = score_mode
        self.artifact_fn = artifact_fn
        self.mesh = mesh
        os.makedirs(cfg.exp_dir, exist_ok=True)
        self.writer = MetricsWriter(os.path.join(cfg.exp_dir, "logs"),
                                    tensorboard=cfg.log_tensorboard)
        self.ckpt = CheckPointManager(
            os.path.join(cfg.exp_dir, "checkpoints"),
            max_to_keep=cfg.max_to_keep,
            keep_every_n_hours=cfg.keep_every_n_hours,
            best_mode="min" if score_mode == "min" else "max",
            use_async=cfg.async_checkpoints,
        )

    def _put(self, batch):
        # one explicit device_put per batch: letting jit transfer the numpy
        # arrays implicitly costs ~2x (measured 29.5 vs 14.6 + 5 ms per small
        # batch over a tunneled chip — per-array transfers serialize)
        if self.mesh is None:
            return jax.device_put(batch)
        from a_robust_registration_loss_tpu.parallel import mesh as pmesh

        return pmesh.shard_batch(batch, self.mesh)

    @staticmethod
    def _epoch_keys(ekey, loader):
        """Per-batch keys for one epoch in ONE device dispatch (a fold_in
        per batch costs ~5 ms each over a tunneled chip). Returns a host
        numpy array; rows act as uint32 PRNG keys.

        RNG-stream compatibility: per-batch keys are ``split(ekey, n)[bi]``.
        Runs checkpointed under the earlier ``fold_in(ekey, bi)`` scheme
        (pre r1-final) resume on a different stream — losses stay valid but
        are not bit-identical to an uninterrupted old-scheme run. The
        kill-and-resume reproducibility guarantee holds within one scheme."""
        n = len(loader) if hasattr(loader, "__len__") else None
        if not n:
            return None
        return np.asarray(jax.random.split(ekey, n))

    # ---- scanned-epoch fast path (device-resident datasets) ------------
    #
    # When a loader exposes device_epoch() (data/dataset.py DeviceCache),
    # the whole training epoch runs as ONE jitted lax.scan over its batches:
    # batches are gathered on device from the resident dataset, so the only
    # per-epoch host work is the shuffle permutation and a single stacked
    # metrics fetch. Batch composition and per-batch PRNG keys are byte-
    # identical to the streaming path (asserted by
    # tests/test_train_harnesses.py::TestDeviceCacheEquality); metric values
    # match except through the line resampler's knife-edge accept test
    # (A+B+C <= S), where the scan-body compilation can flip a few accepts
    # vs the standalone step program — same caveat as GSPMD repartitioning,
    # train/losses.py batch_lines.

    def _constrain_batch(self, batch):
        if self.mesh is None:
            return batch
        from jax.sharding import PartitionSpec as P

        from a_robust_registration_loss_tpu.parallel import mesh as pmesh

        return jax.tree_util.tree_map(
            lambda a: pmesh.constrain(a, self.mesh, P("dp")), batch)

    def _train_epoch_fn(self):
        if self._train_epoch_jit is None:
            step = self._train_step_raw

            def epoch_fn(params, opt_state, data, idx, keys):
                def body(carry, xs):
                    p, o = carry
                    i, k = xs
                    batch = jax.tree_util.tree_map(lambda a: a[i], data)
                    batch = self._constrain_batch(batch)
                    p, o, m = step(p, o, batch, k)
                    return (p, o), m

                (params, opt_state), ms = jax.lax.scan(
                    body, (params, opt_state), (idx, keys))
                return params, opt_state, ms

            self._train_epoch_jit = jax.jit(epoch_fn)
        return self._train_epoch_jit

    def _eval_epoch_fn(self):
        if self._eval_epoch_jit is None:
            step = self._eval_step_raw

            def epoch_fn(params, data, idx, keys):
                def body(carry, xs):
                    i, k = xs
                    batch = jax.tree_util.tree_map(lambda a: a[i], data)
                    batch = self._constrain_batch(batch)
                    return carry, step(params, batch, k)

                _, ms = jax.lax.scan(body, 0, (idx, keys))
                return ms

            self._eval_epoch_jit = jax.jit(epoch_fn)
        return self._eval_epoch_jit

    @staticmethod
    def _reduce_stacked(ms, extra=()):
        """Stacked (n_batches, ...) per-batch metrics -> epoch aggregates:
        COUNTER_KEYS summed, everything else averaged; ``extra`` holds
        remainder-batch metric dicts (drop_last=False tails) that weigh one
        batch each, matching the streaming path."""
        out = {}
        host = jax.device_get(ms)
        extra = [jax.device_get(e) for e in extra]
        for k, v in host.items():
            vals = list(np.asarray(v).reshape(np.asarray(v).shape[0], -1)
                        .mean(-1)) + [float(np.asarray(e[k]).mean())
                                      for e in extra]
            s = float(np.sum(vals))
            out[k] = s if k in COUNTER_KEYS else s / max(len(vals), 1)
        return out

    def restore(self, params, opt_state):
        """Reload-latest when resume is on. Returns (params, opt_state,
        start_epoch)."""
        if not self.cfg.resume:
            return params, opt_state, 0
        target = {"params": params, "opt_state": opt_state, "epoch": 0}
        state, step = self.ckpt.load(target)
        if state is None:
            return params, opt_state, 0
        return state["params"], state["opt_state"], int(state["epoch"]) + 1

    def fit(self, params, opt_state, train_loader, test_loader=None,
            epochs: Optional[int] = None, log=print):
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        params, opt_state, start = self.restore(params, opt_state)
        # keys are derived per epoch via fold_in and split per batch, so a
        # kill-and-resume run reproduces the exact losses of an
        # uninterrupted one
        root_key = jax.random.PRNGKey(cfg.seed)
        step_idx = 0
        history = []
        for epoch in range(start, epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            ekey = jax.random.fold_in(root_key, epoch)
            batch_keys = self._epoch_keys(ekey, train_loader)
            t0 = time.perf_counter()

            if hasattr(train_loader, "device_epoch"):
                # ONE device dispatch for the whole epoch (scanned batches
                # over the device-resident dataset) + one metrics fetch
                data, full_idx, rem = train_loader.device_epoch(epoch)
                params, opt_state, ms = self._train_epoch_fn()(
                    params, opt_state, data, full_idx,
                    batch_keys[: len(full_idx)])
                step_idx += len(full_idx)
                extra = []
                if rem is not None:   # drop_last=False tail (ragged shape)
                    params, opt_state, m_rem = self.train_step(
                        params, opt_state,
                        self._constrain_batch(train_loader.gather(rem)),
                        batch_keys[len(full_idx)])
                    step_idx += 1
                    extra.append(m_rem)
                train_metrics = self._reduce_stacked(ms, extra)
            else:
                agg, n_batches = {}, 0

                def _absorb(device_metrics):
                    # ONE host transfer for the whole metrics dict — per-
                    # scalar float() would block once per metric per batch,
                    # which over a tunneled device dominates small-step
                    # training loops
                    for k, v in jax.device_get(device_metrics).items():
                        agg[k] = agg.get(k, 0.0) + float(v)

                # the metrics fetch runs one batch behind the dispatch so
                # its round trip overlaps the next step's device compute
                # (and the loader's host-side batch prep) instead of
                # serializing with it
                pending_metrics = None
                for bi, batch in enumerate(train_loader):
                    sub = (batch_keys[bi] if batch_keys is not None
                           and bi < len(batch_keys)
                           else jax.random.fold_in(ekey, bi))
                    batch = self._put(batch)
                    if pending_metrics is not None:
                        _absorb(pending_metrics)
                    params, opt_state, pending_metrics = self.train_step(
                        params, opt_state, batch, sub
                    )
                    step_idx += 1
                    n_batches += 1
                if pending_metrics is not None:
                    _absorb(pending_metrics)
                train_metrics = {
                    k: (v if k in COUNTER_KEYS else v / max(n_batches, 1))
                    for k, v in agg.items()}
            self.writer.add_scalars(train_metrics, epoch, prefix="train/")

            eval_metrics = {}
            if self.eval_step is not None and test_loader is not None:
                eval_keys = self._epoch_keys(
                    jax.random.fold_in(ekey, 1_000_000), test_loader)
                if hasattr(test_loader, "device_epoch"):
                    data, full_idx, rem = test_loader.device_epoch(epoch)
                    extra = []
                    ms = None
                    if len(full_idx):
                        ms = self._eval_epoch_fn()(
                            params, data, full_idx,
                            eval_keys[: len(full_idx)])
                    if rem is not None:
                        extra.append(self.eval_step(
                            params,
                            self._constrain_batch(test_loader.gather(rem)),
                            eval_keys[len(full_idx)]))
                    if ms is not None:
                        eval_metrics = self._reduce_stacked(ms, extra)
                    else:
                        eval_metrics = self._reduce_stacked(
                            {k: np.zeros((0,)) for k in extra[0]}, extra)
                else:
                    eagg, m = {}, 0

                    def _eabsorb(device_metrics):
                        for k, v in jax.device_get(device_metrics).items():
                            eagg[k] = eagg.get(k, 0.0) + float(v)

                    pending_eval = None  # one-batch-behind fetch like train
                    for bi, batch in enumerate(test_loader):
                        sub = (eval_keys[bi] if eval_keys is not None
                               and bi < len(eval_keys)
                               else jax.random.fold_in(ekey, 1_000_000 + bi))
                        batch = self._put(batch)
                        if pending_eval is not None:
                            _eabsorb(pending_eval)
                        pending_eval = self.eval_step(params, batch, sub)
                        m += 1
                    if pending_eval is not None:
                        _eabsorb(pending_eval)
                    eval_metrics = {k: v / max(m, 1) for k, v in eagg.items()}
                self.writer.add_scalars(eval_metrics, epoch, prefix="test/")

            score = eval_metrics.get(self.score_key,
                                     train_metrics.get(self.score_key))
            if cfg.save_every and epoch % cfg.save_every == 0:
                self.ckpt.save(
                    epoch,
                    {"params": params, "opt_state": opt_state, "epoch": epoch},
                    score=score,
                )
            if (cfg.artifacts_every and self.artifact_fn is not None
                    and epoch % cfg.artifacts_every == 0):
                sub = jax.random.fold_in(ekey, 2_000_000)
                batch = next(iter(train_loader))
                src, pred, tar, gt = self.artifact_fn(params, self._put(batch),
                                                      sub)
                dump_registration_objs(
                    os.path.join(cfg.exp_dir, "artifacts"), f"ep{epoch}",
                    src, pred, tar, gt,
                )
            dt = time.perf_counter() - t0
            self.writer.add_scalar("time/epoch_seconds", dt, epoch)
            self.writer.flush()
            history.append({"epoch": epoch, **train_metrics,
                            **{f"test_{k}": v for k, v in eval_metrics.items()}})
            log(f"epoch {epoch}: "
                + " ".join(f"{k}={v:.6f}" for k, v in train_metrics.items())
                + (f" | test: " + " ".join(
                    f"{k}={v:.6f}" for k, v in eval_metrics.items())
                   if eval_metrics else "")
                + f" ({dt:.1f}s)")
        self.ckpt.wait_until_finished()  # commit any in-flight async save
        return params, opt_state, history
