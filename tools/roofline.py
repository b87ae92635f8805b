"""Roofline probe: measured chip peaks vs the production SpMV (PERF.md).

Measures on the real device (one process at a time — the TPU is behind a
single-holder tunnel, CLAUDE.md):

1. HBM streaming peak: triad y = s*x + y at several footprints, f32/f64.
2. MXU matmul peak (8192^3) — context for the compute ceiling.
3. DIA shifted-slice sweep at production shapes (diagonal counts of the
   swelling-3d operators), unrolled vs lax.scan chunked path
   (ops/dia.py UNROLL_LOCAL) — the measured basis for the scan default
   and for the "no Pallas kernel" decision.
4. ELL gather SpMV at the same shape (the path DIA replaced).

Timing methodology (hard-won, round 4): on the axon tunnel backend
``block_until_ready`` returns at enqueue, not completion, and the
transport dedups identical (executable, inputs) launches — so every
probe is a ``lax.fori_loop`` CHAIN whose carry feeds iteration i+1,
ending in a scalar reduction fetched to host (forces completion), and
the per-iteration time is the DELTA between an R1-iteration and an
R2-iteration chain (cancels the tunnel round trip and the fetch).

Usage: python tools/roofline.py    (markdown table on stdout)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


from porotpu.utils.roofline import delta_time, pattern as _pattern, stream_peak  # noqa: E402  (shared methodology — bench.py uses the same helpers)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def matmul_peak(dtype, n=8192):
    a = jax.jit(
        lambda: _pattern(n * n, jnp.float32).reshape(n, n).astype(dtype)
    )()

    def make(R):
        @jax.jit
        def f(a):
            def body(i, a):
                a2 = a @ a
                # renormalize each iteration (structured pattern data has
                # uncontrolled spectral radius); one stream pass, <5% of
                # the matmul time
                return a2 / jnp.max(jnp.abs(a2)).astype(a.dtype)

            a = lax.fori_loop(0, R, body, a)
            return jnp.sum(a[0, :8].astype(jnp.float32))

        return f

    t = delta_time(make, a, R1=2, R2=10)
    return 2 * n**3 / t / 1e12  # TFLOP/s


def dia_sweep(n, nd, dtype, unroll):
    """Banded sweep y = sum_d data[d] * xpad[o_d : o_d + n] (chained)."""
    from porotpu.ops.dia import _mv_sweep

    half = nd // 2
    offs = tuple(range(-half, nd - half))
    data = jax.jit(
        lambda: (_pattern(nd * n, dtype, seed=1) / nd).reshape(nd, n)
    )()
    xpad = jax.jit(_pattern, static_argnums=(0, 1))(n + nd, dtype)

    def make(R):
        @jax.jit
        def f(args):
            data, xpad = args

            def body(i, xp):
                y = _mv_sweep(data, offs, xp, half, n, unroll)
                y = y / (1.0 + jnp.max(jnp.abs(y)))
                return jnp.concatenate([y, xp[n:]])

            xp = lax.fori_loop(0, R, body, xpad)
            return xp[0] + xp[-1]

        return f

    t = delta_time(make, (data, xpad), R1=3, R2=23)
    gbs = (nd * n + 2 * n) * np.dtype(dtype).itemsize / t / 1e9
    return t, gbs, nd * n / t


def ell_gather(n, L, dtype):
    data = jax.jit(lambda: (_pattern(n * L, dtype, seed=2) / L).reshape(n, L))()
    cols = jax.jit(
        lambda: jnp.clip(
            jnp.arange(n, dtype=jnp.int32)[:, None]
            + (jnp.arange(n * L, dtype=jnp.int32).reshape(n, L) * 2203) % 2801
            - 1400,
            0,
            n - 1,
        )
    )()
    x = jax.jit(_pattern, static_argnums=(0, 1))(n, dtype)

    def make(R):
        @jax.jit
        def f(args):
            data, cols, x = args

            def body(i, x):
                y = jnp.sum(data * x[cols], axis=1)
                return y / (1.0 + jnp.max(jnp.abs(y)))

            x = lax.fori_loop(0, R, body, x)
            return x[0] + x[-1]

        return f

    t = delta_time(make, (data, cols, x), R1=2, R2=8)
    return t, n * L / t


def main():
    jax.config.update("jax_enable_x64", True)  # f64 probes need x64
    dev = jax.devices()[0]
    log("device:", dev, dev.platform)
    print(f"device: {dev.device_kind}")
    print()
    print("| probe | value |")
    print("|---|---|")
    for dt, mb in (("float32", 256), ("float32", 1024), ("float64", 256)):
        g = stream_peak(dt, mb)
        print(f"| HBM stream peak (triad, {dt}, {mb} MB arrays) | {g:.0f} GB/s |", flush=True)
    for dt in ("bfloat16", "float32"):
        tf = matmul_peak(dt)
        print(f"| MXU matmul ({dt}, 8192^3) | {tf:.1f} TFLOP/s |", flush=True)
    # production shapes: swelling-3d N=13 solid block ~ (n=100k, nd=233);
    # 2D blocks nd~43-176
    for n, nd, dt in (
        (98304, 233, "float32"),
        (98304, 233, "float64"),
        (98304, 48, "float32"),
    ):
        for unroll in (384, 16):
            mode = "unrolled" if nd <= unroll else "scan16"
            t, gbs, nnzs = dia_sweep(n, nd, dt, unroll)
            print(
                f"| DIA sweep n={n} nd={nd} {dt} [{mode}] | "
                f"{t*1e3:.3f} ms = {gbs:.0f} GB/s = {nnzs:.2e} nnz/s |",
                flush=True,
            )
    t, nnzs = ell_gather(27783, 191, "float32")
    print(
        f"| ELL gather SpMV (n=27783, L=191, f32) | {t*1e3:.3f} ms = {nnzs:.2e} nnz/s |"
    )


if __name__ == "__main__":
    main()
