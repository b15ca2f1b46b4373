"""Test harness config: force an 8-virtual-device CPU platform BEFORE jax
imports, so sharding/pjit tests run without TPU hardware. The real-TPU path is
exercised by bench.py / __graft_entry__.py, not the unit suite."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config route works.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall-clock is dominated by XLA
# compiles of tiny-shape programs (one CPU core), and those programs are
# identical across runs. Cache them under /tmp so repeat runs (chunked CI
# passes, local red-green loops) skip the compiles entirely.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ARRL_TEST_CACHE", "/tmp/arrl_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference/code"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier: torch-golden/transplant oracles, smoke "
             "training, end-to-end convergence (the full suite the verify "
             "skill runs; default tier stays under ~2 minutes)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: tests marked ``slow`` — explicitly, or implicitly by
    using the torch oracle fixtures (``torch_reference`` / ``torch_models``)
    — are skipped unless --runslow is given."""
    for item in items:
        if {"torch_reference", "torch_models"} & set(getattr(item, "fixturenames", ())):
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)

# single definition of the fingerprint, shared with bench.py's recording gate
from a_robust_registration_loss_tpu.utils.freshness import (  # noqa: E402
    SLOW_STAMP,
    source_fingerprint,
)


def pytest_sessionfinish(session, exitstatus):
    """After a green FULL --runslow run, stamp the source fingerprint the
    slow tier was validated against. tests/test_suite_freshness.py makes the
    default tier fail loudly when source changed without a slow re-run
    (round-2 verdict weak #5 / task 7)."""
    config = session.config
    if not config.getoption("--runslow", default=False):
        return
    if exitstatus != 0 or session.testsfailed:
        return
    # partial runs (explicit file selection, -k/-m filters) must not refresh
    if config.option.keyword or config.option.markexpr:
        return
    args = [os.path.abspath(os.path.normpath(a)) for a in config.args]
    if not all(a in (TESTS_DIR, REPO_ROOT) for a in args):
        return
    import json
    import time

    with open(SLOW_STAMP, "w") as f:
        json.dump({"fingerprint": source_fingerprint(),
                   "time": time.strftime("%Y-%m-%dT%H:%M:%S")}, f, indent=1)
        f.write("\n")


def _install_reference_stubs():
    """Stub the reference's unavailable third-party imports (igl, openmesh,
    cv2) so its loss.py / LieAlgebra can be imported for golden-parity tests.
    We only ever exercise code paths that do not touch the stubs."""
    import types

    for name in ("igl", "openmesh", "cv2", "trimesh", "open3d"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)


@pytest.fixture(scope="session")
def torch_reference():
    """Import the actual PyTorch reference modules (read-only golden oracle).

    Returns a namespace with .loss, .se3, .so3, .sinc or skips if torch or the
    reference tree is unavailable.
    """
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    _install_reference_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    ns = types_ns = type(sys)("torch_reference")  # simple namespace module
    ns.torch = torch
    ns.loss = importlib.import_module("loss")
    lie = importlib.import_module("LieAlgebra")
    ns.se3 = lie.se3
    ns.so3 = lie.so3
    ns.sinc = lie.sinc
    return types_ns


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
