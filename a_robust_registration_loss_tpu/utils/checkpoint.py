"""Checkpoint management with the reference CheckPointManager's policy set.

TPU-native re-design of rpm/common/torch.py:34-158 (the richest of the
reference's three checkpoint flavors — the others are plain torch.save
best/periodic, dcp/Train_DCP.py:683-705, fmr/Train_FMR.py:242-259):

- rolling retention of the latest ``max_to_keep`` checkpoints;
- promotion to *permanent* every ``keep_every_n_hours`` (never pruned);
- a separate best-score copy updated when the score improves;
- a ``checkpoints.txt``-style manifest (JSON here) recording the rotation,
  permanents, best step and best score;
- ``load`` restoring params + optimizer state + step (latest, best, or a
  specific step).

Serialization is orbax (SURVEY.md §5 prescribes orbax as the TPU
equivalent); each checkpoint is a directory ``ckpt-{step}`` holding the full
pytree (params, opt_state, step, anything else the caller includes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from typing import Any, Optional


class CheckPointManager:
    """save(step, state, score=None) / load(target, step=None, best=False)."""

    MANIFEST = "checkpoints.json"

    def __init__(self, directory: str, max_to_keep: int = 5,
                 keep_every_n_hours: float = 6.0, best_mode: str = "max",
                 use_async: bool = False):
        import orbax.checkpoint as ocp

        if best_mode not in ("max", "min"):
            raise ValueError("best_mode must be 'max' or 'min'")
        self.directory = directory
        self.max_to_keep = max_to_keep
        self.keep_every_n_hours = keep_every_n_hours
        self.best_mode = best_mode
        self.use_async = use_async
        if use_async:
            # saves return immediately and serialize off the epoch critical
            # path; at most one save is in flight (save()/load() wait first)
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        os.makedirs(directory, exist_ok=True)
        self._state = self._read_manifest()

    def wait_until_finished(self):
        """Block until any in-flight async save has committed (no-op for the
        sync checkpointer)."""
        if self.use_async:
            self._ckptr.wait_until_finished()

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self):
        return os.path.join(self.directory, self.MANIFEST)

    def _read_manifest(self):
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                return json.load(f)
        return {"rotating": [], "permanent": [], "best_step": None,
                "best_score": None, "next_save_time": 0.0}

    def _write_manifest(self):
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- paths --------------------------------------------------------------
    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt-{step}")

    def _best_path(self) -> str:
        return os.path.join(self.directory, "ckpt-best")

    # -- public API ---------------------------------------------------------
    def save(self, step: int, state: Any, score: Optional[float] = None,
             _now: Optional[float] = None) -> str:
        """Write ckpt-{step}; rotate/promote/copy-best per policy. Returns
        the checkpoint path. ``_now`` is injectable for tests."""
        now = time.time() if _now is None else _now
        self.wait_until_finished()  # at most one async save in flight
        path = self._path(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)

        # reference semantics (rpm/common/torch.py:89-98): promotion happens
        # when a checkpoint rotates OUT of the buffer — the first eviction is
        # always promoted, then one per keep_every_n_hours of save-time
        st = self._state
        # re-saving a step (e.g. a crash between save and manifest write)
        # replaces its entry rather than duplicating it — a duplicate would
        # later evict and delete the directory the live entry points at
        st["rotating"] = [e for e in st["rotating"] if e[0] != step]
        st["rotating"].append([step, now])
        while len(st["rotating"]) > self.max_to_keep:
            old_step, old_time = st["rotating"].pop(0)
            if old_time > st["next_save_time"]:
                st["permanent"].append(old_step)
                st["next_save_time"] = (
                    old_time + self.keep_every_n_hours * 3600.0
                )
            else:
                old_path = self._path(old_step)
                if os.path.exists(old_path):
                    shutil.rmtree(old_path)

        if score is not None:
            better = (
                st["best_score"] is None
                or (self.best_mode == "max" and score > st["best_score"])
                or (self.best_mode == "min" and score < st["best_score"])
            )
            if better:
                st["best_score"] = float(score)
                st["best_step"] = step
                best = self._best_path()
                if self.use_async:
                    # copytree would race the in-flight write of ``path``;
                    # issue a SECOND save of the in-memory state instead
                    # (waits for the ckpt-{step} save first: one in flight),
                    # and commit it before the manifest write below — the
                    # manifest must never point at an in-flight best dir
                    self.wait_until_finished()
                    if os.path.exists(best):
                        shutil.rmtree(best)
                    self._ckptr.save(best, state)
                    self.wait_until_finished()
                else:
                    if os.path.exists(best):
                        shutil.rmtree(best)
                    shutil.copytree(path, best)
        self._write_manifest()
        return path

    def latest_step(self) -> Optional[int]:
        steps = [s for s, _ in self._state["rotating"]] + self._state["permanent"]
        return max(steps) if steps else None

    def best_step(self) -> Optional[int]:
        return self._state["best_step"]

    def load(self, target: Any, step: Optional[int] = None,
             best: bool = False):
        """Restore a checkpoint into the structure of ``target`` (an example
        state pytree — optax states round-trip exactly). Returns
        (state, step) or (None, None) when nothing exists (the reference's
        reload-latest path tolerates an empty directory,
        rpm/Train_RPM.py:453-464).

        Latest-load is crash-tolerant: if the newest checkpoint is
        unreadable (e.g. the process died mid-save), older rotating steps
        are tried in order, each skip logged — the resume guarantee
        degrades to the previous epoch instead of failing. If EVERY
        existing checkpoint fails to restore (a systematic problem, e.g. a
        changed state structure), the last error is re-raised rather than
        silently restarting from scratch (which would then rotate away the
        old run's checkpoints)."""
        self.wait_until_finished()
        if best:
            if self._state["best_step"] is None:
                return None, None
            return (self._ckptr.restore(self._best_path(), item=target),
                    self._state["best_step"])
        if step is not None:
            return self._ckptr.restore(self._path(step), item=target), step
        steps = sorted(
            {s for s, _ in self._state["rotating"]}
            | set(self._state["permanent"]), reverse=True)
        last_err = None
        for s in steps:
            try:
                return self._ckptr.restore(self._path(s), item=target), s
            except Exception as e:
                last_err = e
                print(f"[checkpoint] skipping unreadable ckpt-{s}: {e!r}",
                      file=sys.stderr)
                continue
        if last_err is not None:
            raise last_err
        return None, None


def load_params_from(exp_dir: str, state_template: Any, best: bool = True):
    """Initialize from ANOTHER experiment's checkpoints — the jax-side
    equivalent of the reference's load-a-pretrained-checkpoint-then-finetune
    workflow (Train_DCP.py:890-893; our --init_from_torch covers the torch
    side). ``exp_dir`` may be the experiment dir or its checkpoints/ subdir;
    ``state_template`` must be a full {params, opt_state, epoch} example
    (orbax restores into its structure). Returns the loaded ``params`` (the
    caller starts a FRESH optimizer over them) or None when the directory
    holds no checkpoint. Prefers the best-tracked checkpoint, falling back
    to the latest."""
    path = exp_dir
    if os.path.isdir(os.path.join(exp_dir, "checkpoints")):
        path = os.path.join(exp_dir, "checkpoints")
    mgr = CheckPointManager(path)
    if best and mgr.best_step() is not None:
        state, _ = mgr.load(state_template, best=True)
    else:
        state, _ = mgr.load(state_template)
    return None if state is None else state["params"]
