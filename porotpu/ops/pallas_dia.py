"""Pallas TPU kernels for the banded (DIA) matvec and transpose matvec.

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

The transpose kernel (``rmv``): y[j] = sum_d data[d, j-o_d] * x[j-o_d],
i.e. y = sum_d shift(data[d] * x, o_d) — the restriction /
Transposed-coupling-block product (AMG P^T r, pressure divergence rows)
that previously rode the XLA ``_rmv_sweep`` inside the PC apply (~90%
of solve time — VERDICT r4).  Matches PETSc MatMultTranspose running at
memory speed (reference lib/AAR.py:135).  Design: every data/x read
stays tile-ALIGNED (p_d = data[d] * x, so the big stream needs no
shifted windows); the shift o = 128*q + r decomposes into a free
sublane row offset (accumulate p_d into row slot q of a (W, 128)
group accumulator) plus ONE lane-rotation per distinct residue r of
the group accumulator; contributions crossing the row-tile boundary
(up to ML rows left, MH rows right) are emitted as small per-tile edge
outputs that XLA adds back shifted — the tile-local analogue of a halo
scatter.

Used by DIA.matvec / DIA.rmatvec (ops/dia.py) when: running on a real
TPU backend, single-device (dist is None), nrows % 128 == 0 (the
driver/bench padded layout guarantees this via "pad multiple"; AMG
coarse levels are row-padded in precond/amg.py), f32 data.  Everything
else falls back to the XLA sweep — including all CPU test runs (the
kernels are unit-tested on CPU in interpreter mode, tests/test_dia.py).
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


def _interpret_mode() -> bool:
    # PORO_PALLAS_INTERPRET=1: dispatch the kernels in interpreter mode on
    # any backend — lets CPU tests exercise the PRODUCTION dispatch paths
    # (incl. the kernel inside the shard_map halo body) end-to-end
    return os.environ.get("PORO_PALLAS_INTERPRET", "0") == "1"


def enabled() -> bool:
    if not HAVE_PALLAS or os.environ.get("PORO_PALLAS", "1") == "0":
        return False
    if _interpret_mode():
        return True
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


def mv(data, offsets, xe, nrows, interpret=None):
    """Banded matvec via the Pallas kernel.

    data: (nd, nrows) with nrows % 128 == 0; offsets: static tuple;
    xe: (ne,) embedded input with ne == nrows.  Returns y (nrows,).
    """
    if interpret is None:
        interpret = _interpret_mode()
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


# ---------------------------------------------------------------------------
# transpose kernel (rmv): y = sum_d shift(data[d] * x, off_d)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rkernel_call(offsets, nd, R, dtype_name, interpret):
    """Build (and cache) the transpose-sweep pallas_call.

    Offsets decompose as o = 128*q + r with r in [0, 128); contributions
    of an input row-tile land in output rows [tile - ML, tile + T + MH):
    ML/MH row slabs cross the tile boundary and are returned as a
    separate per-tile edge output (combined by the ``rmv`` wrapper).
    """
    dtype = jnp.dtype(dtype_name)
    qr = [divmod(o, LANES) for o in offsets]  # r in [0, 128) for any sign
    ML = max(0, -min(q for q, _ in qr))
    MH = max(0, max(q for q, _ in qr)) + 1  # +1 row for the lane carry
    T = _tile_rows(nd, dtype.itemsize)
    W = T + ML + MH
    groups = {}
    for d, (q, r) in enumerate(qr):
        groups.setdefault(r, []).append((d, q + ML))  # slot = q + ML

    def kernel(data_ref, x_ref, ymain_ref, yedge_ref, accP_ref, acc_ref):
        # accP/acc are VMEM scratch: Mosaic has no dynamic_update_slice on
        # VALUES, but static slices of REFS read/write fine — the slotted
        # accumulation is a ref store per diagonal
        i = pl.program_id(0)
        # mask garbage rows of the final partial tile: the data/x blocks
        # beyond row R are uninitialized VMEM, and their products would
        # leak into VALID output rows through the backward (ML) shifts
        rowmask = (
            jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0) + i * T < R
        )
        xt = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
        acc_ref[:] = jnp.zeros((W, LANES), dtype=dtype)
        for r, members in groups.items():
            if r != 0:
                accP_ref[:] = jnp.zeros((W, LANES), dtype=dtype)
            tgt = acc_ref if r == 0 else accP_ref
            for d, slot in members:
                p = jnp.where(rowmask, data_ref[d] * xt, 0)
                tgt[slot : slot + T] = tgt[slot : slot + T] + p
            if r != 0:
                # shift flat indices forward by r: lane l -> (l + r) % 128
                # with the wrapped lanes carrying into the NEXT row.  The
                # row-roll is circular, but accP's last row is provably
                # zero (slot_max + T - 1 == W - 2), so nothing wraps.
                b1 = pltpu.roll(accP_ref[:], jnp.int32(r), axis=1)
                bd = pltpu.roll(b1, jnp.int32(1), axis=0)
                acc_ref[:] = acc_ref[:] + jnp.where(lane >= r, b1, bd)
        ymain_ref[:] = acc_ref[ML : ML + T]
        if ML:
            yedge_ref[0, :ML] = acc_ref[:ML]
        yedge_ref[0, ML:] = acc_ref[ML + T :]

    ntiles = pl.cdiv(R, T)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), dtype),
            jax.ShapeDtypeStruct((ntiles, ML + MH, LANES), dtype),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (nd, T, LANES),
                lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((T, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, LANES), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ML + MH, LANES),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, LANES), dtype),
            pltpu.VMEM((W, LANES), dtype),
        ],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
            if not interpret
            else None
        ),
        interpret=interpret,
    )
    return call, ML, MH, T, ntiles


def rmv(data, offsets, x, nrows, interpret=None):
    """Banded transpose matvec via the Pallas kernel.

    data: (nd, nrows) with nrows % 128 == 0; offsets: static tuple;
    x: (nrows,).  Returns y (nrows,) over the EMBEDDED column space
    (ne == nrows; the caller gathers col_emb / truncates to ncols).
    """
    if interpret is None:
        interpret = _interpret_mode()
    nd = data.shape[0]
    R = nrows // LANES
    call, ML, MH, T, ntiles = _rkernel_call(
        tuple(offsets), nd, R, str(data.dtype), interpret
    )
    data2 = data.reshape(nd, R, LANES)
    x2 = x.reshape(R, LANES)
    with jax.enable_x64(False):
        ymain, yedge = call(data2, x2)
    # combine the boundary-crossing slabs (tile i's left slab lands in
    # tile i-1's last ML rows; its right slab in tile i+1's first MH rows)
    if ntiles == 1:
        # single tile: edge slabs target rows outside [0, R) — provably
        # zero (no matrix entry maps there) — discard
        return ymain.reshape(-1)[: nrows]
    if ML <= T and MH <= T:
        yt = jnp.pad(ymain, ((0, ntiles * T - R), (0, 0))).reshape(
            ntiles, T, LANES
        )
        if ML:
            yt = yt.at[:-1, T - ML :, :].add(yedge[1:, :ML])
        yt = yt.at[1:, :MH, :].add(yedge[:-1, ML:])
        return yt.reshape(-1, LANES)[:R].reshape(-1)
    # wide-band fallback (slab spans > 1 tile): scatter-add the slabs
    total = ntiles * T
    ybig = jnp.zeros((total + ML + MH, LANES), dtype=ymain.dtype)
    ybig = ybig.at[ML : ML + R].set(ymain)
    tstart = jnp.arange(ntiles) * T
    if ML:
        il = (tstart[:, None] + jnp.arange(ML)[None, :]).reshape(-1)
        ybig = ybig.at[il].add(yedge[:, :ML].reshape(-1, LANES))
    ir = (tstart[:, None] + (T + ML) + jnp.arange(MH)[None, :]).reshape(-1)
    ybig = ybig.at[ir].add(yedge[:, ML:].reshape(-1, LANES))
    return ybig[ML : ML + R].reshape(-1)
