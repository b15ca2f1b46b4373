"""TPU-native framework for "A Robust Loss for Point Cloud Registration" (ICCV 2021).

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the reference
PyTorch codebase (Dengzhi-USTC/A-robust-registration-loss):

- ``se3``:       one SE(3)/SO(3)/sinc Lie-algebra library (the reference triplicates it).
- ``ops``:       the correspondence-free intersected-line robust metric (fixed-shape,
                 jit/vmap/grad-able; Pallas fused kernels for the hot path), line
                 sampling, chamfer, FPS/kNN/bbox geometry primitives.
- ``models``:    DCP, RPM-Net, FMR registration networks as Flax modules.
- ``data``:      OBJ IO, the unified registration dataset contract, depth pipeline.
- ``train``:     classical single-pair optimization demo + unsupervised training
                 harnesses for the model zoo, orbax checkpointing.
- ``parallel``:  device-mesh / sharding helpers (batch-DP and line-axis sharding
                 over ICI via shard_map/pjit).
- ``utils``:     config, metrics (Euler-angle errors), logging/observability.
"""

__version__ = "0.1.0"

from a_robust_registration_loss_tpu import se3  # noqa: F401
