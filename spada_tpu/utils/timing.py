"""Trustworthy device timing under remote/tunneled TPU runtimes.

On a tunneled PJRT backend (axon), ``block_until_ready`` can return once the
buffer is *defined* remotely, long before the device computed it — naive
wall-clock timing then reports physically impossible numbers (we measured
"12 PFLOP/s" on one v5e chip).  The only reliable fence is a host readback.

:func:`device_time` therefore times ``K`` executions *chained inside one
jitted fori_loop* (a scalar data dependency threads each iteration's output
into the next iteration's input, defeating both loop hoisting and dead-code
elimination) and subtracts the measured host round-trip latency.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Sequence

import numpy as np


def measure_roundtrip(n: int = 5) -> float:
    """Median host<->device round-trip including a trivial kernel."""
    import jax
    import jax.numpy as jnp

    z = jnp.zeros((8, 128))
    tiny = jax.jit(lambda z: jnp.sum(z))
    float(tiny(z))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(tiny(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def device_time_stats(
    fn: Callable,
    args: Sequence,
    k: int = 8,
    trials: int = 3,
    roundtrip: float | None = None,
):
    """(median seconds, slope samples) per execution of ``fn(*args)``.

    ``fn`` must accept its first argument perturbed by a traced scalar
    (the loop-carry dependency): it is called as ``fn(args[0] + eps, *rest)``
    where ``eps`` is a tiny traced scalar.  ``fn`` may return one array or
    a pytree of arrays.  The median over ``trials`` of the two-point slope
    rejects shared-pool interference spikes in either direction (a min
    over slope samples could go negative under jitter); the raw samples
    quantify that session's spread.

    The FULL output pytree is the fori_loop carry, with the next
    iteration's perturbation derived from each carried leaf.  A scalar
    ``sum(out)`` carry is not enough: XLA fuses the reduction into an
    elementwise producer and never stores the output — a pure ``a*b``
    microbenchmark "measured" 1147 GB/s on a 819 GB/s chip that way.
    Carried leaves must be materialized every iteration, so output HBM
    writes are timed like the real dispatch pays them.  (Pallas kernels
    store internally either way; their numbers are unchanged by this.)
    """
    import jax
    import jax.numpy as jnp

    if roundtrip is None:
        roundtrip = measure_roundtrip()

    def _probe(out):
        # one element per leaf: cheap, but keeps every carried leaf live
        # (XLA's while-loop simplifier removes only fully-dead carry slots)
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.float32(0.0)
        for leaf in leaves:
            if leaf.size:
                acc = acc + jnp.sum(
                    leaf.reshape(-1)[:1]).astype(jnp.float32)
        return acc

    @functools.partial(jax.jit, static_argnames="K")
    def runK(first, *rest, K=k):
        out_shape = jax.eval_shape(fn, first, *rest)
        init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shape)

        def body(i, carry):
            s, prev = carry
            # cast the perturbation to the input dtype — adding a strong-f32
            # scalar would silently promote bf16 inputs to f32 and change
            # what is being measured
            eps = ((s + _probe(prev)) * 1e-30).astype(first.dtype)
            out = fn(first + eps, *rest)
            return (_probe(out) * 1e-30, out)

        s, out = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), init))
        return s + _probe(out) * 1e-30

    def run_once(kk):
        t0 = time.perf_counter()
        float(runK(*args, K=kk))
        return time.perf_counter() - t0

    # two-point slope: per-iter = (t(4K) - t(K)) / 3K.  Subtracting the two
    # totals cancels the ~30ms round-trip constant exactly, so sub-ms
    # kernels don't drown in its jitter (naive rt subtraction read 0.0ms
    # for a true 0.2ms kernel).  Compile both K variants first.
    run_once(k)
    run_once(4 * k)
    samples = []
    for _ in range(trials):
        t1 = run_once(k)
        t4 = run_once(4 * k)
        samples.append((t4 - t1) / (3 * k))
    return max(float(np.median(samples)), 1e-9), samples


def device_time(
    fn: Callable,
    args: Sequence,
    k: int = 8,
    trials: int = 3,
    roundtrip: float | None = None,
) -> float:
    """Seconds per execution of ``fn(*args) -> array`` (median of slopes).

    See :func:`device_time_stats` for the measurement contract; this is the
    median-only convenience used throughout the engines."""
    return device_time_stats(fn, args, k=k, trials=trials,
                             roundtrip=roundtrip)[0]
