"""Pallas TPU kernel for the banded (DIA) matvec — the hot-op fast path.

y[i] = sum_d data[d, i] * xe_pad[i + off_d] at HBM streaming speed:
measured 831 GB/s f32 at the production 3D shape with the diagonal data
forced out of VMEM (= the chip's practical HBM peak; the XLA
shifted-slice lowering delivers 204 GB/s at the same shape — PERF.md).

Design (tools/pallas_dia.py prototype, kept as the measurement harness):

- x (padded, small) is VMEM-resident for the whole call; the diagonal
  data — the dominant stream — is pipelined through VMEM in
  (nd, T, 128) row tiles by the Pallas grid.
- x is laid out (rows, 128); a diagonal offset o = 128*q + r costs one
  lane-rotation per DISTINCT residue r (pltpu.roll + select, shared by
  all diagonals with that residue) plus a free sublane-shifted read per
  diagonal.
- the grid is ceil-divided: the final partial row tile is handled by
  Pallas' masked stores, and the x window is over-padded by one tile so
  its dynamic slice never clamps.

Used by DIA.matvec (ops/dia.py) when: running on a real TPU backend,
single-device (dist is None), nrows % 128 == 0 (the driver/bench padded
layout guarantees this via "pad multiple"), f32 data, and the diagonal
count is worth a kernel launch.  Everything else falls back to the XLA
sweep — including all CPU test runs (the kernel itself is unit-tested on
CPU in interpreter mode, tests/test_dia.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import kept optional: CPU-only deployments never need it
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANES = 128
# max rows-per-tile; actual T also respects the VMEM budget for the
# double-buffered (nd, T, 128) data tile
T_MAX = int(os.environ.get("PORO_PALLAS_T", "256"))
VMEM_BUDGET = int(os.environ.get("PORO_PALLAS_VMEM", str(96 * 1024 * 1024)))


def enabled() -> bool:
    if not HAVE_PALLAS or os.environ.get("PORO_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tile_rows(nd: int, itemsize: int) -> int:
    # double-buffered data tile + x + y must fit the VMEM budget
    t = T_MAX
    while t > 8 and 2 * nd * t * LANES * itemsize > VMEM_BUDGET // 2:
        t //= 2
    return max(t, 8)


@functools.lru_cache(maxsize=None)
def _kernel_call(offsets, nd, R, dtype_name, interpret):
    """Build (and cache) the pallas_call for a static (offsets, shape)."""
    dtype = jnp.dtype(dtype_name)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    lo_rows = (lo + LANES - 1) // LANES
    hi_rows = (hi + LANES - 1) // LANES + 1  # +1 row for the lane carry
    T = _tile_rows(nd, dtype.itemsize)
    W = T + lo_rows + hi_rows
    groups = {}
    for d, o in enumerate(offsets):
        q, r = divmod(o + lo_rows * LANES, LANES)
        groups.setdefault(r, []).append((d, q))

    def kernel(data_ref, x_ref, y_ref):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * T, T)
        w = x_ref[pl.ds(row0, W), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
        acc = jnp.zeros((T, LANES), dtype=dtype)
        for r, ds_ in groups.items():
            if r == 0:
                xr = w
            else:
                # lane rotation by r with row carry: xr[m,l] = wflat[128m+l+r]
                # shifts must be i32 even under jax_enable_x64 (Mosaic's
                # tpu.dynamic_rotate rejects i64 operands)
                wl = pltpu.roll(w, jnp.int32(LANES - r), axis=1)
                wup = pltpu.roll(wl, jnp.int32(W - 1), axis=0)
                xr = jnp.where(lane < LANES - r, wl, wup)
            for d, q in ds_:
                acc = acc + data_ref[d] * xr[q : q + T, :]
        y_ref[:] = acc

    grid = (pl.cdiv(R, T),)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nd, T, LANES),
                # zeros derived from the (i32) grid index: plain 0 lowers
                # to i64 under jax_enable_x64 and Mosaic rejects the
                # mixed-width index function; captured jnp constants are
                # rejected outright
                lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x, resident
        ],
        out_specs=pl.BlockSpec(
            (T, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
            if not interpret
            else None
        ),
        interpret=interpret,
    )
    return call, lo_rows, hi_rows, T


def mv(data, offsets, xe, nrows, interpret=False):
    """Banded matvec via the Pallas kernel.

    data: (nd, nrows) with nrows % 128 == 0; offsets: static tuple;
    xe: (ne,) embedded input with ne == nrows.  Returns y (nrows,).
    """
    nd = data.shape[0]
    R = nrows // LANES
    call, lo_rows, hi_rows, T = _kernel_call(
        tuple(offsets), nd, R, str(data.dtype), interpret
    )
    # x laid out (rows, 128) with lo_rows leading zero rows, hi_rows + one
    # extra tile of trailing zero rows (so the final partial tile's window
    # slice never clamps)
    pad_hi = (hi_rows + T) * LANES
    xpad = jnp.pad(xe, (lo_rows * LANES, pad_hi)).reshape(-1, LANES)
    data2 = data.reshape(nd, R, LANES)
    # trace the kernel with x64 OFF even inside an x64 outer program
    # (mixed-precision solves): under x64 the grid-index avals and
    # index-map literals lower to i64, which Mosaic rejects; the f32
    # operands are unaffected by the context
    with jax.enable_x64(False):
        y = call(data2, xpad)
    return y.reshape(-1)
