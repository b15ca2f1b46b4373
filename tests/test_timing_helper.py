"""Functional tests for benchmarks/_timing.device_ms — the scan-based
device-time harness every recorded benchmark number now relies on. The two
compiler escape hatches it must close (loop-invariant hoisting of
key/int-only subgraphs; DCE of bool/int-only outputs) were real bugs that
silently zeroed recorded components (see benchmarks/RESULTS.md)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

from _timing import device_ms  # noqa: E402


class TestDeviceMs:
    def test_float_fn(self):
        x = jnp.ones((512, 64))
        ms = device_ms(lambda a: jnp.tanh(a @ a.T).sum(), x, iters=5)
        assert np.isfinite(ms) and ms >= 0.0

    def test_bool_only_output_not_dce(self):
        """A function whose only output is bool must still feed the carry
        (finding: the old helper let XLA dead-code-eliminate the whole
        workload)."""
        x = jnp.linspace(-1, 1, 2048).reshape(16, 128)
        ms = device_ms(lambda a: (a @ a.T) > 0.1, x, iters=5)
        assert np.isfinite(ms) and ms >= 0.0

    def test_key_only_input_not_hoisted(self):
        """A key-only workload must execute every iteration (raw uint32
        keys are perturbed with an iteration-dependent runtime zero)."""
        key = jax.random.PRNGKey(0)
        ms = device_ms(lambda k: jax.random.uniform(k, (8, 128)).sum(),
                       key, iters=5)
        assert np.isfinite(ms) and ms >= 0.0

    def test_values_bit_exact(self):
        """The runtime-zero perturbations must not change values: run the
        measured fn standalone and inside the instrumented loop body."""
        x = jnp.linspace(0.0, 3.0, 1024).reshape(8, 128)

        def fn(a):
            return jnp.sort(a.reshape(-1))[17] + jnp.sum(jnp.sqrt(a + 1))

        direct = float(fn(x))
        # replicate the body's shift at runtime-zero carry
        c = jnp.float32(0.0)
        shifted = float(fn(x + c))
        assert direct == shifted
