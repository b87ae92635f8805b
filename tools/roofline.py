"""Roofline probe: measured chip peaks vs the production SpMV (PERF.md).

Measures on the real device (one process at a time — the TPU is behind a
single-holder tunnel, CLAUDE.md):

1. HBM streaming peak: triad y = a*x + y at several footprints, f32/f64.
2. MXU matmul peak (bf16/f32 8192^3) — context for the compute ceiling.
3. DIA shifted-slice sweep at production shapes (diagonal counts of the
   swelling-3d operators), unrolled vs lax.scan chunked path
   (ops/dia.py UNROLL_LOCAL) — the measured basis for the scan default
   and for the "no Pallas kernel" decision: the sweep is a pure
   stream of `data` through the VPU that XLA already emits at
   near-stream-peak, so a hand kernel has no headroom left to win.
4. ELL gather SpMV at the same shape (the path DIA replaced).

Usage: python tools/roofline.py [> output snippet]   (diagnostics: stderr)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, reps=20):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def stream_peak(dtype, mb):
    n = int(mb * 1e6 / np.dtype(dtype).itemsize)
    x = jnp.ones((n,), dtype=dtype)
    y = jnp.ones((n,), dtype=dtype)
    f = jax.jit(lambda x, y: 1.0001 * x + y)
    t = timeit(lambda a, b: f(a, b), x, y, reps=10)
    return 3 * n * np.dtype(dtype).itemsize / t / 1e9  # GB/s


def matmul_peak(dtype, n=8192):
    a = jnp.ones((n, n), dtype=dtype)
    f = jax.jit(lambda a: a @ a)
    t = timeit(f, a, reps=5)
    return 2 * n**3 / t / 1e12  # TFLOP/s


def dia_sweep(n, nd, dtype, unroll):
    """Banded sweep y = sum_d data[d] * xpad[o_d : o_d + n]."""
    import os

    os.environ["PORO_DIA_UNROLL_LOCAL"] = str(unroll)
    # fresh import-time constants: emulate by calling the sweep directly
    from porotpu.ops.dia import _mv_sweep

    rng = np.random.default_rng(0)
    half = nd // 2
    offs = tuple(range(-half, nd - half))
    data = jnp.asarray(rng.normal(size=(nd, n)).astype(dtype))
    xpad = jnp.asarray(rng.normal(size=n + nd).astype(dtype))
    f = jax.jit(lambda d, x: _mv_sweep(d, offs, x, half, n, unroll))
    t = timeit(f, data, xpad, reps=10)
    gbs = (nd * n + 2 * n) * np.dtype(dtype).itemsize / t / 1e9
    return t, gbs, nd * n / t


def ell_gather(n, L, dtype):
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(n, L)).astype(dtype))
    cols = jnp.asarray(
        np.clip(
            np.arange(n)[:, None] + rng.integers(-1400, 1400, size=(n, L)),
            0,
            n - 1,
        ).astype(np.int32)
    )
    x = jnp.asarray(rng.normal(size=n).astype(dtype))
    f = jax.jit(lambda d, c, x: jnp.sum(d * x[c], axis=1))
    t = timeit(f, data, cols, x, reps=3)
    return t, n * L / t


def main():
    dev = jax.devices()[0]
    log("device:", dev, dev.platform)
    print(f"device: {dev.device_kind}")
    print()
    print("| probe | value |")
    print("|---|---|")
    for dt, mb in (("float32", 256), ("float32", 1024), ("float64", 256)):
        g = stream_peak(dt, mb)
        print(f"| HBM stream peak (triad, {dt}, {mb} MB arrays) | {g:.0f} GB/s |")
    for dt in ("bfloat16", "float32"):
        tf = matmul_peak(dt)
        print(f"| MXU matmul ({dt}, 8192^3) | {tf:.1f} TFLOP/s |")
    # production shapes: swelling-3d N=13 solid block ~ (n=100k, nd=233);
    # 2D blocks nd~43-176
    for n, nd, dt in ((98304, 233, "float32"), (98304, 233, "float64"),
                      (98304, 48, "float32")):
        for unroll in (384, 48):
            mode = "unrolled" if nd <= unroll else "scan16"
            t, gbs, nnzs = dia_sweep(n, nd, dt, unroll)
            print(
                f"| DIA sweep n={n} nd={nd} {dt} [{mode}] | "
                f"{t*1e3:.2f} ms = {gbs:.0f} GB/s = {nnzs:.2e} nnz/s |"
            )
    t, nnzs = ell_gather(27783, 191, "float32")
    print(f"| ELL gather SpMV (n=27783, L=191, f32) | {t*1e3:.2f} ms = {nnzs:.2e} nnz/s |")


if __name__ == "__main__":
    main()
