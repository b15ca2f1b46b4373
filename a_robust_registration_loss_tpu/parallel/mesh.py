"""Device-mesh / sharding helpers.

The reference has no distribution at all beyond single-host
``nn.DataParallel`` (reference: dcp/Train_DCP.py:875-877; SURVEY.md §2.7).
Here distribution is first-class and TPU-native: a named
``jax.sharding.Mesh`` over ICI with GSPMD partitioning — annotate shardings,
let XLA insert the collectives.

Axes:
- ``dp``: data parallel — batch of registration pairs / training batch.
- ``sp``: line parallel — the metric's line axis. Lines are i.i.d. and
  stage 1 (the heavy O(L*F*nnei) pass) is embarrassingly parallel over L;
  its outputs (the fixed-shape slot buffers, ~L*4 small records) are cheap to
  re-replicate for the globally-coupled stage 2 (the exact median couples all
  lines of a sample). Because stage 1 is non-differentiable by construction
  (stop_gradient semantics matching the reference's detached weights), no
  gradient collective is needed across ``sp``; gradients ride ``dp`` psums
  inserted by XLA.

Backend note: with ``backend="xla"`` GSPMD partitions the stage-1 sweep
itself over ``sp``. With ``backend="pallas"`` the fused kernel is an
opaque custom call to GSPMD (plain sharded execution is correct but
gathers the kernel's operands — verified on the 8-virtual-device mesh);
the training losses therefore dispatch to a shard_mapped line-parallel
path when a mesh with sp > 1 is configured
(train/losses.py:_metric_batch_rt_sp): each device sweeps its L/sp line
shard through the kernel, the tiny per-line slot records all_gather over
sp, and the globally-coupled stage 2 (exact median) runs redundantly per
sp member. Values/gradients equal the unsharded pallas path
(tests/test_parallel.py::TestSpParallelPallas).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, sp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """A (dp, sp) mesh over ICI. Axis sizes must multiply to the device count
    in use; pass dp=len(devices) for pure data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    if dp * sp != len(devices):
        raise ValueError(f"dp*sp == {dp * sp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / pair) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def line_sharding(mesh: Mesh) -> NamedSharding:
    """(B, L, 6) lines: batch over dp, line axis over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch(tree, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over dp.

    Leaves whose leading axis is not divisible by dp (e.g. the reference's
    batch-1 eval loaders, pre_dataloader.py:227-233) are replicated instead —
    XLA still runs the step correctly, just without batch partitioning."""
    dp = mesh.shape["dp"]

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(x, batch_sharding(mesh))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)
