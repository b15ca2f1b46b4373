"""On-hardware kernel gate as a pytest.

The unit suite pins jax to CPU (conftest.py) and checks the Pallas kernels
only in interpret mode; the real-chip equivalence gate lives in
``bench.pallas_gate`` and runs before every recorded headline number. This
module promotes that gate into the test suite: it re-runs it in a
SUBPROCESS (the in-process jax platform is already pinned) on whatever
non-CPU backend the machine exposes, and skips cleanly on CPU-only hosts.

Slow tier: the subprocess compiles ~6 programs over the device tunnel
(~2-3 min cold; seconds once /tmp/arrl_tpu_cache is warm).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GATE_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/arrl_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
if jax.default_backend() == "cpu":
    print("SKIP-NO-ACCELERATOR")
    raise SystemExit(0)

import bench
from a_robust_registration_loss_tpu.train import classical

v1, v2 = bench._synthetic_pair(1024)
cfg = classical.ClassicalConfig(n_lines=2048, num_sample=512,
                                compute_chamfer=False, backend="pallas")
data = classical.prepare_pair(v1, v2, cfg)
bench.pallas_gate(data, n_lines=1024, n_faces=512)  # raises on mismatch
print("GATE-OK")
"""


@pytest.mark.slow
def test_pallas_xla_equivalence_on_hardware():
    """count/slot_idx exact, loss+grad <=1e-4, resampler geometry+rate —
    on the real chip (bench.pallas_gate), not the CPU interpreter."""
    env = dict(os.environ)
    # undo the suite's CPU pinning for the child
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    proc = subprocess.run(
        [sys.executable, "-c", _GATE_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    out = proc.stdout + proc.stderr
    if "SKIP-NO-ACCELERATOR" in out:
        pytest.skip("no non-CPU jax backend on this host")
    assert proc.returncode == 0, out
    assert "GATE-OK" in proc.stdout, out
