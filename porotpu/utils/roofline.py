"""Shared honest-timing helpers for device measurements (ONE methodology).

On the axon tunnel backend ``block_until_ready`` returns at ENQUEUE, not
completion, and the device transport dedups identical (executable,
inputs) launches (PERF.md, round-4 measurement).  Every timing here is
therefore a ``lax.fori_loop`` CHAIN whose carry feeds iteration i+1,
terminated by a host fetch of a result-dependent scalar, with the tunnel
round trip and fetch cancelled by the R2−R1 iteration-count delta.

Used by both ``tools/roofline.py`` (the standalone probe) and
``bench.py`` (the in-solve SpMV + stream-peak roofline line), so the
"% of measured stream peak" printed by the bench and the peaks recorded
in PERF.md come from the same code path (VERDICT r4 weak #3: the bench
previously used a 10-individually-dispatched-reps triad that understated
the peak by ~2x and overstated the SpMV fraction).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pattern(n, dtype, seed=0):
    """Deterministic device-generated stream data.

    Big ``jax.random`` generations take minutes through the tunnel
    (CLAUDE.md); an iota-mod pattern streams at full rate.
    """
    i = jnp.arange(n, dtype=jnp.int32)
    return (((i * (1103 + seed)) % 1009).astype(dtype) - 504.0) * 1e-3


def delta_time(make_chain, init, trials=3, R1=3, R2=13):
    """Per-iteration seconds of a chained body via the R2−R1 delta.

    ``make_chain(R)`` returns a jitted function of ``init`` running R
    chained iterations and returning a result-dependent scalar.  Each
    trial perturbs the (floating) inputs so the transport cannot replay
    a cached launch.
    """
    f1, f2 = make_chain(R1), make_chain(R2)
    float(f1(init))  # compile + warm
    float(f2(init))

    def timed(f, eps):
        x = jax.tree_util.tree_map(
            lambda a: a * (1.0 + eps)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            init,
        )
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        float(f(x))
        return time.perf_counter() - t0

    t1 = min(timed(f1, 1e-5 * (i + 1)) for i in range(trials))
    t2 = min(timed(f2, 1e-5 * (i + 11)) for i in range(trials))
    return max((t2 - t1) / (R2 - R1), 1e-12)


def stream_peak(dtype, mb=256):
    """HBM streaming peak via a chained triad y = s*x + y (3 arrays/rep)."""
    n = int(mb * 1e6 / np.dtype(dtype).itemsize)
    x = jax.jit(pattern, static_argnums=(0, 1))(n, dtype)

    def make(R):
        @jax.jit
        def f(x):
            def body(i, y):
                return (1.0 + 1e-7 * i.astype(dtype)) * x + y

            y = lax.fori_loop(0, R, body, jnp.zeros_like(x))
            return y[0] + y[-1]

        return f

    t = delta_time(make, x, R1=5, R2=55)
    return 3 * n * np.dtype(dtype).itemsize / t / 1e9  # GB/s


def op_stream_time(A, b, R1=3, R2=23):
    """Per-matvec seconds of an operator pytree via the chained delta.

    The chain renormalizes the carry each iteration (uncontrolled
    spectral radius) — one cheap stream pass over the n-vector, charged
    to the matvec but negligible against the operator data stream.
    """

    def make(R):
        @jax.jit
        def f(args):
            A, y = args

            def body(i, y):
                z = A.matvec(y)
                return z / (1.0 + jnp.max(jnp.abs(z)))

            y = lax.fori_loop(0, R, body, y)
            return y[0] + y[-1]

        return f

    return delta_time(make, (A, b), R1=R1, R2=R2)
