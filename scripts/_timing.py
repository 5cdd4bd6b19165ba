"""Reliable wall-time measurement over the axon TPU tunnel.

`jax.block_until_ready` can return before device execution completes on the
tunneled axon platform, so naive timing reads ~0 ms for multi-ms kernels. A
scalar device->host readback is the only reliable fence. The device stream
is FIFO, so one fence on the LAST rep's output bounds the whole loop; the
single ~27 ms tunnel round-trip is measured separately and subtracted.
"""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=50):
    """Mean per-call wall ms of fn(*args), tunnel round-trip excluded."""
    first = lambda t: jax.tree.leaves(t)[0]
    out = fn(*args)
    _ = float(jnp.sum(first(out)))           # warm-up + fence
    t0 = time.perf_counter()
    _ = float(jnp.sum(first(out)))           # bare round-trip on ready buffer
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(first(out)))
    return ((time.perf_counter() - t0) - rt) / reps * 1e3
