"""Device-time measurement that is immune to the axon tunnel's dispatch
serialization.

Per-dispatch wall timing over the tunneled TPU is unreliable: the plugin
drops into a serialized ~1 ms-RTT-per-dispatch mode after (a) compiling any
jit with a closure-captured concrete device array or (b) ANY synchronous
device->host fetch, even a scalar ``float()`` (see benchmarks/RESULTS.md
"Axon dispatch-pipelining poison"). Both happen in every realistic process,
so wall/dispatch conflates device time with host RTT. Worse, in a
fresh process ``block_until_ready`` returns EARLY, so un-fetched wall
timings under-report arbitrarily.

``device_ms`` instead runs the function inside ONE ``lax.scan`` dispatch,
fetch-brackets the result (true completion), and measures at TWO loop
lengths (``iters`` and ``2*iters``): per-iteration device time is
``(wall_2 - wall_1) / iters``, so the constant per-dispatch cost (tunnel
RTT + fetch) cancels exactly instead of being estimated and subtracted —
the earlier subtract-one-measured-RTT scheme clamped sub-millisecond
functions to 0.0 whenever an RTT spike exceeded the whole loop's wall.
Each length takes the best of ``reps`` timed runs to reject RTT spikes.

Two compiler escape hatches must be closed so the scan really evaluates the
body ``iters`` times:

1. Loop-invariant code motion: any subgraph whose inputs are all loop-
   invariant is computed ONCE before the loop. So every input leaf is
   perturbed with an iteration-dependent runtime-zero: floats get
   ``+ carry`` (carry chains through outputs), ints/uints (PRNG keys
   included) get ``+ i * zero_int``, bools get ``^ ((i * zero_int) != 0)``.
   All values are bit-exact at runtime.
2. Dead-code elimination: outputs must feed the carry, so the carry
   advances by ``eps * mean(outputs)`` over ALL leaves — float leaves
   directly, int/bool leaves via a float cast — with runtime ``eps == 0``.
"""

from __future__ import annotations

import time


def device_ms(fn, *args, iters: int = 50, warmup: bool = True,
              reps: int = 3):
    """Average device milliseconds per evaluation of ``fn(*args)``.

    fn must be a traceable (jit-able) function of device/numpy arrays
    (floats, ints/uints incl. raw PRNG keys, bools) with array (pytree)
    outputs. Typed (new-style) PRNG keys are not perturbed — pass raw
    uint32 keys (``jax.random.PRNGKey``) for key-only workloads.
    """
    import jax
    import jax.numpy as jnp

    def _kind(a):
        dt = jnp.result_type(a)
        if jnp.issubdtype(dt, jnp.floating):
            return "f"
        if jnp.issubdtype(dt, jnp.integer):
            return "i"
        if dt == jnp.bool_:
            return "b"
        return "x"

    def loop(n, z, eps, zi, *fargs):
        def body(c, i):
            iz = i * zi  # runtime 0, loop-variant, unprovable at compile time

            def shift(a):
                k = _kind(a)
                if k == "f":
                    return a + c.astype(a.dtype)
                if k == "i":
                    return a + iz.astype(a.dtype)
                if k == "b":
                    return a ^ (iz != 0)
                return a
            out = fn(*jax.tree.map(shift, fargs))
            # nan_to_num: outputs may legitimately contain inf sentinels
            # (masked sorts); eps * inf would be NaN and corrupt the carry
            s = jnp.float32(0.0)
            for x in jax.tree.leaves(out):
                k = _kind(x)
                if k == "f":
                    s = s + jnp.nan_to_num(jnp.mean(x)).astype(jnp.float32)
                elif k in ("i", "b"):
                    s = s + jnp.mean(x.astype(jnp.float32))
            return c + eps * s, ()
        c, _ = jax.lax.scan(body, z, jnp.arange(n, dtype=jnp.int32))
        return c

    jloop = jax.jit(loop, static_argnums=0)
    z = jnp.float32(0.0)
    eps = jnp.float32(0.0)
    zi = jnp.int32(0)

    # compile both loop lengths + enter the tunnel's synchronous-fetch mode
    float(jloop(iters, z, eps, zi, *args))
    float(jloop(2 * iters, z, eps, zi, *args))
    if warmup:
        float(jloop(iters, z, eps, zi, *args))

    def timed(n):
        best = float("inf")
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            float(jloop(n, z, eps, zi, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    wall_1 = timed(iters)
    wall_2 = timed(2 * iters)
    # per-dispatch constants (tunnel RTT + fetch) cancel in the difference
    return max(wall_2 - wall_1, 0.0) / iters * 1000.0
