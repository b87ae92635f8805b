"""Pallas TPU SpMV kernel for ELL storage.

The jnp path (ops/spmv.py) lets XLA lower the gather+reduce; this kernel
takes manual control for the production path:

- the source vector x lives **entirely in VMEM** (sparse systems at
  ~100k-1M rows in f32 are 0.4-4 MB — far under the ~16 MB VMEM budget),
  so every gather is on-chip with no HBM round trips;
- the (rows, L) data/cols panels stream through VMEM in row tiles via the
  pallas grid pipeline (double-buffered HBM->VMEM DMA handled by the
  compiler);
- the kernel reduces over the L lanes with a VPU multiply-accumulate.

Falls back to the XLA path automatically if Mosaic cannot lower the
gather on the current TPU generation (porotpu.ops.sparse.ELL.matvec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spmv_kernel(x_ref, data_ref, cols_ref, out_ref):
    x = x_ref[:]
    data = data_ref[:]
    cols = cols_ref[:]
    gathered = x[cols]  # (T, L) on-chip gather from VMEM-resident x
    out_ref[:] = jnp.sum(data * gathered, axis=1)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def ell_matvec_pallas(data, cols, x, row_tile: int = 1024):
    """y = A @ x with A in ELL (data, cols); x fully VMEM-resident."""
    n, L = data.shape
    nt = pl.cdiv(n, row_tile)
    return pl.pallas_call(
        _spmv_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x, whole vector
            pl.BlockSpec(
                (row_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (row_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((row_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), data.dtype),
    )(x, data, cols)


def spmv_supported() -> bool:
    """Probe whether the Pallas gather lowers on this backend."""
    try:
        import numpy as np

        d = jnp.asarray(np.ones((8, 4), np.float32))
        c = jnp.asarray(np.zeros((8, 4), np.int32))
        x = jnp.asarray(np.ones(8, np.float32))
        ell_matvec_pallas(d, c, x, row_tile=8).block_until_ready()
        return True
    except Exception:
        return False
