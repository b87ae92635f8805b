"""Pallas prototype of the banded (DIA) sweep — measure vs the XLA path.

The production SpMV (ops/dia.py) is y[i] = sum_d data[d,i] * x[i + o_d],
which XLA lowers to one unaligned vector shift + fma per diagonal and
delivers ~204 GB/s of the 675 GB/s stream peak (PERF.md).  This kernel
tests whether a hand layout wins:

- the (small) padded x lives whole in VMEM; the (large) diagonal data is
  streamed through VMEM in (nd, T, 128) row tiles by the Pallas pipeline;
- x is viewed as (rows, 128) lanes; each diagonal offset o = 128*q + r is
  applied as ONE lane-rotation per distinct residue r (shared across all
  diagonals with that residue) + a free sublane(row)-shifted read per
  diagonal — trading nd unaligned shifts for G<=nd rotations (offsets on
  a 3D lattice cluster into few residues only when widths align, so for
  generic offsets this mainly tests Mosaic vs XLA codegen).

Decision rule (PERF.md "Pallas decision"): integrate only if this beats
the scan16 XLA sweep by >1.5x at the production shape; otherwise record
the number and keep the XLA path.

Run: python tools/pallas_dia.py    (on the TPU, one process at a time)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


LANES = 128
T = int(os.environ.get("TILE_ROWS", "64"))  # y rows per grid step


def _halo_rows(offsets):
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    lo_rows = (lo + LANES - 1) // LANES
    hi_rows = (hi + LANES - 1) // LANES + 1  # +1 row for the lane carry
    return lo_rows, hi_rows


def build_kernel(offsets, dtype):
    """Row-tiled banded matvec kernel for static ``offsets``."""
    offsets = tuple(int(o) for o in offsets)
    lo_rows, hi_rows = _halo_rows(offsets)
    groups = {}
    for d, o in enumerate(offsets):
        oa = o + lo_rows * LANES  # offset into xpad, >= 0
        q, r = divmod(oa, LANES)
        groups.setdefault(r, []).append((d, q))
    W = T + lo_rows + hi_rows

    def kernel(data_ref, x_ref, y_ref):
        # data_ref: (nd, T, 128) tile; x_ref: FULL (Rp, 128) xpad in VMEM
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * T, T)
        w = x_ref[pl.ds(row0, W), :]  # this tile's window (W, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
        acc = jnp.zeros((T, LANES), dtype=dtype)
        for r, ds_ in groups.items():
            if r == 0:
                xr = w
            else:
                # lane rotation by r with row carry: xr[m,l] = wflat[128m+l+r]
                # = w[m, l+r] for l < 128-r, else w[m+1, l+r-128].
                # (a concatenate of row-offset slices trips Mosaic's
                # "offset mismatch on non-concat dimension"; roll + select
                # lowers cleanly)
                wl = pltpu.roll(w, LANES - r, axis=1)  # w[m,(l+r)%128]
                wup = pltpu.roll(wl, W - 1, axis=0)  # row m+1 (last row junk)
                xr = jnp.where(lane < LANES - r, wl, wup)
            for d, q in ds_:
                acc = acc + data_ref[d] * xr[q : q + T, :]
        y_ref[:] = acc

    return kernel, lo_rows, hi_rows, len(groups)


def pallas_dia_matvec(data2, xpad2, offsets):
    """data2: (nd, R, 128); xpad2: (R + lo_rows + hi_rows, 128) in VMEM."""
    nd, R, _ = data2.shape
    dtype = data2.dtype
    kernel, lo_rows, hi_rows, G = build_kernel(offsets, dtype)
    grid = (R // T,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nd, T, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full xpad, resident
        ],
        out_specs=pl.BlockSpec(
            (T, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(data2, xpad2)


def _pattern(n, dtype, seed=0):
    i = jnp.arange(n, dtype=jnp.int32)
    return (((i * (1103 + seed)) % 1009).astype(dtype) - 504.0) * 1e-3


def delta_time(make_chain, init, trials=3, R1=3, R2=23):
    f1, f2 = make_chain(R1), make_chain(R2)
    float(f1(init))
    float(f2(init))

    def timed(f, eps):
        x = jax.tree_util.tree_map(
            lambda a: a * (1.0 + eps) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            init,
        )
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        float(f(x))
        return time.perf_counter() - t0

    t1 = min(timed(f1, 1e-5 * (i + 1)) for i in range(trials))
    t2 = min(timed(f2, 1e-5 * (i + 11)) for i in range(trials))
    return max((t2 - t1) / (R2 - R1), 1e-12)


def main():
    n = int(os.environ.get("N_ELEMS", "98304"))  # multiple of 128*T
    nd = int(os.environ.get("ND", "233"))
    dtype = jnp.float32
    half = nd // 2
    offsets = tuple(range(-half, nd - half))

    R = n // LANES
    data = np.asarray(_pattern(nd * n, jnp.float32, seed=1)).reshape(nd, n) / nd
    x = np.asarray(_pattern(n, jnp.float32, seed=2))

    # reference result (numpy)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    xp = np.concatenate([np.zeros(lo), x, np.zeros(hi)])
    y_ref = np.zeros(n)
    for d, o in enumerate(offsets):
        y_ref += data[d] * xp[lo + o : lo + o + n]

    lo_rows, hi_rows = _halo_rows(offsets)
    xpad_flat = np.zeros((R + lo_rows + hi_rows) * LANES, dtype=np.float32)
    xpad_flat[lo_rows * LANES : lo_rows * LANES + n] = x
    data2 = jnp.asarray(data.reshape(nd, R, LANES), dtype=dtype)
    xpad2 = jnp.asarray(xpad_flat.reshape(-1, LANES))

    f = jax.jit(functools.partial(pallas_dia_matvec, offsets=offsets))
    y = np.asarray(f(data2, xpad2)).ravel()
    err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    log(f"pallas kernel correctness: rel err {err:.2e}")
    assert err < 1e-5, "pallas kernel wrong"

    def make(Rr):
        @jax.jit
        def g(args):
            data2, xpad2 = args

            def body(i, xpv):
                y = pallas_dia_matvec(data2, xpv, offsets)
                y = y / (1.0 + jnp.max(jnp.abs(y)))
                return lax.dynamic_update_slice(xpv, y, (lo_rows, 0))

            xpv = lax.fori_loop(0, Rr, body, xpad2)
            return xpv[0, 0] + xpv[-1, -1]

        return g

    t = delta_time(make, (data2, xpad2))
    gbs = (nd * n + 2 * n) * 4 / t / 1e9
    print(
        f"pallas DIA sweep n={n} nd={nd} f32 T={T}: {t*1e3:.3f} ms = {gbs:.0f} GB/s "
        f"= {nd*n/t:.2e} nnz/s   (XLA scan16 reference: 0.453 ms = 204 GB/s)"
    )


if __name__ == "__main__":
    main()
