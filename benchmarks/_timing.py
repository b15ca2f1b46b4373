"""Device-time measurement that is immune to the axon tunnel's dispatch
serialization.

Per-dispatch wall timing over the tunneled TPU is unreliable: the plugin
drops into a serialized ~1 ms-RTT-per-dispatch mode after (a) compiling any
jit with a closure-captured concrete device array or (b) ANY synchronous
device->host fetch, even a scalar ``float()`` (see benchmarks/RESULTS.md
"Axon dispatch-pipelining poison"). Both happen in every realistic process,
so wall/dispatch conflates device time with host RTT.

``device_ms`` instead runs the function ``iters`` times inside ONE
``lax.scan`` dispatch and divides the wall by ``iters`` — a single
dispatch's RTT amortizes away and the measurement is pure device time.

XLA must not hoist the loop-invariant body out of the scan, so the body is
chained through a runtime-zero carry: float inputs get ``+ carry`` (carry is
0.0 at runtime, unknown at compile time) and the carry advances by
``eps * sum(outputs)`` with a runtime ``eps == 0.0``. Values are bit-exact
(x + 0.0 == x for finite x) and every iteration depends on the previous
one's outputs, so the compiler keeps all ``iters`` evaluations.
"""

from __future__ import annotations

import time


def device_ms(fn, *args, iters: int = 50, warmup: bool = True):
    """Average device milliseconds per evaluation of ``fn(*args)``.

    fn must be a traceable (jit-able) function of device/numpy arrays with
    array (pytree) outputs. Keys and int/bool arrays pass through unchanged;
    float arrays are perturbed by the runtime-zero carry (bit-exact no-op).
    """
    import jax
    import jax.numpy as jnp

    def _is_float(a):
        return jnp.issubdtype(jnp.result_type(a), jnp.floating)

    def loop(z, eps, *fargs):
        def body(c, _):
            shifted = jax.tree.map(
                lambda a: a + c.astype(a.dtype) if _is_float(a) else a, fargs)
            out = fn(*shifted)
            # nan_to_num: outputs may legitimately contain inf sentinels
            # (masked sorts); eps * inf would be NaN and corrupt the carry
            s = sum(jnp.nan_to_num(jnp.mean(x)).astype(jnp.float32)
                    for x in jax.tree.leaves(out) if _is_float(x))
            if not isinstance(s, jnp.ndarray):  # no float outputs
                s = jnp.float32(0.0)
            return c + eps * s, ()
        c, _ = jax.lax.scan(body, z, None, length=iters)
        return c

    jloop = jax.jit(loop)
    z = jnp.float32(0.0)
    eps = jnp.float32(0.0)

    # The axon plugin's block_until_ready returns EARLY until the process
    # has performed a synchronous device->host fetch (after which every
    # dispatch serializes at ~RTT instead — both documented in
    # benchmarks/RESULTS.md). So: force sync mode with a fetch, bracket the
    # timed region with a fetch of the carry (true completion), and
    # subtract one measured fetch RTT.
    float(jloop(z, eps, *args))  # warmup + compile + enter sync mode
    if warmup:
        float(jloop(z, eps, *args))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(z + 0.0)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    float(jloop(z, eps, *args))
    wall = time.perf_counter() - t0
    return max(wall - rtt, 0.0) / iters * 1000.0
