"""TPU-native framework for "A Robust Loss for Point Cloud Registration" (ICCV 2021).

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the reference
PyTorch codebase (Dengzhi-USTC/A-robust-registration-loss):

- ``se3``:       one SE(3)/SO(3)/sinc Lie-algebra library (the reference triplicates it).
- ``ops``:       the correspondence-free intersected-line robust metric (fixed-shape,
                 jit/vmap/grad-able; Pallas fused kernels for the hot path), line
                 sampling, chamfer, FPS/kNN/bbox geometry primitives.
- ``models``:    DCP, RPM-Net, FMR registration networks as Flax modules.
- ``data``:      OBJ/PLY IO (with a C++ fast path in ``native``), the unified
                 registration dataset contract + loaders, augmentation
                 transforms, neighbor-precompute CLI, depth-capture pipeline.
- ``train``:     classical single-pair optimization demo + the three
                 unsupervised training harnesses (DCP/RPM/FMR) with orbax
                 checkpointing and metric logging.
- ``eval``:      accuracy oracles: Euler-angle errors, pp-wise metrics, the
                 FMR dm twist error and eval CSV.
- ``parallel``:  device-mesh / sharding helpers (batch-DP and line-axis sharding
                 over ICI via shard_map/pjit).
- ``utils``:     CheckPointManager, metrics writer, run logs, step timing,
                 headless registration visualization (``utils.viz``).

``MIGRATION.md`` at the repo root maps every reference entry point / API /
flag / artifact to its equivalent here.
"""

__version__ = "0.1.0"

from a_robust_registration_loss_tpu import se3  # noqa: F401
