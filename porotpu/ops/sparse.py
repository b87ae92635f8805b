"""Device sparse-matrix containers for TPU.

Replaces PETSc Mat (MPIAIJ CSR) — reference lib/Preconditioner.py:61-68,
lib/AAR.py:135.  Host-side assembly produces scipy CSR; for the device we
use **ELL (padded-row) storage**: TPU vector units want static shapes and
regular access, so each row stores exactly L = max-nnz-per-row (data, col)
pairs, padded with (0.0, row-local duplicate col).  SpMV is then a dense
gather + multiply + row reduction — XLA-fusable, and the shape is static
for jit.

``FieldMatrix`` holds per-field blocks of the 3-field operator keyed by
(row_field, col_field).  With field-major numbering the reference's
createSubMatrix extraction becomes a host-side CSR slice at setup time.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .spmv import ell_matvec


@jax.tree_util.register_pytree_node_class
@dataclass
class ELL:
    """Padded-row (ELLPACK) sparse matrix on device."""

    data: jax.Array  # (nrows, L) dtype
    cols: jax.Array  # (nrows, L) int32
    ncols: int

    def tree_flatten(self):
        return (self.data, self.cols), (self.ncols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def shape(self):
        return (self.data.shape[0], self.ncols)

    @property
    def nnz_padded(self):
        return self.data.shape[0] * self.data.shape[1]

    @classmethod
    def from_csr(cls, A: sp.spmatrix, dtype=jnp.float32) -> "ELL":
        A = A.tocsr()
        A.sum_duplicates()
        A.eliminate_zeros()  # BC row surgery leaves stored zeros; padding
        # is driven by max row nnz, so drop them
        n, m = A.shape
        counts = np.diff(A.indptr)
        L = max(int(counts.max()) if n else 1, 1)

        from ..native import get_lib

        lib = get_lib()
        if lib is not None and A.dtype == np.float64:
            emit_f32 = dtype == jnp.float32
            data = np.empty((n, L), dtype=np.float32 if emit_f32 else np.float64)
            cols = np.empty((n, L), dtype=np.int32)
            indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
            indices = np.ascontiguousarray(A.indices, dtype=np.int32)
            adata = np.ascontiguousarray(A.data)
            fill = lib.csr_to_ell_f32 if emit_f32 else lib.csr_to_ell
            fill(
                indptr.ctypes.data,
                indices.ctypes.data,
                adata.ctypes.data,
                n,
                L,
                data.ctypes.data,
                cols.ctypes.data,
            )
        else:
            data = np.zeros((n, L), dtype=np.float64)
            cols = np.zeros((n, L), dtype=np.int32)
            # vectorized fill: position of each nnz within its row
            rows = np.repeat(np.arange(n), counts)
            pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
            data[rows, pos] = A.data
            cols[rows, pos] = A.indices
            # pad columns with each row's own first column (gather stays local)
            pad = np.arange(L)[None, :] >= counts[:, None]
            first_col = cols[:, 0:1]
            cols = np.where(pad, first_col, cols)
        return cls(jnp.asarray(data, dtype=dtype), jnp.asarray(cols), m)

    def matvec(self, x: jax.Array) -> jax.Array:
        return ell_matvec(self.data, self.cols, x)

    def rmatvec(self, x: jax.Array) -> jax.Array:
        """A^T @ x (scatter-add; see ops.spmv.ell_rmatvec)."""
        from .spmv import ell_rmatvec

        return ell_rmatvec(self.data, self.cols, x, self.ncols)

    def __matmul__(self, x):
        return self.matvec(x)

    @property
    def nnz(self):
        # number of stored (padded) entries; true nnz is <= this
        return self.data.size

    def to_dense(self) -> np.ndarray:
        n, L = self.data.shape
        out = np.zeros((n, self.ncols))
        d = np.asarray(self.data, dtype=np.float64)
        c = np.asarray(self.cols)
        np.add.at(out, (np.repeat(np.arange(n), L), c.ravel()), d.ravel())
        return out


def field_slices(sizes: dict) -> dict:
    out = {}
    off = 0
    for k, n in sizes.items():
        out[k] = slice(off, off + n)
        off += n
    return out


@jax.tree_util.register_pytree_node_class
class FieldMatrix:
    """Block matrix over named contiguous field segments.

    Blocks are device ELL matrices keyed (row_field, col_field); missing
    blocks are zero.  Equivalent capability to the reference's submatrix
    family Ms_s..Mfp_fp (lib/Preconditioner.py:60-75) without extraction.
    """

    def __init__(self, blocks: dict, sizes: dict):
        self.blocks = dict(blocks)
        self.sizes = dict(sizes)
        self.slices = field_slices(self.sizes)
        self.n = sum(self.sizes.values())

    def tree_flatten(self):
        keys = sorted(self.blocks.keys())
        return tuple(self.blocks[k] for k in keys), (keys, tuple(self.sizes.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, sizes = aux
        return cls(dict(zip(keys, children)), dict(sizes))

    @classmethod
    def from_csr_blocks(cls, blocks: dict, sizes: dict, dtype=jnp.float32):
        dev = {k: ELL.from_csr(v, dtype) for k, v in blocks.items() if v.nnz > 0}
        return cls(dev, sizes)

    def block(self, r, c):
        return self.blocks.get((r, c))

    def matvec(self, x: jax.Array) -> jax.Array:
        segs = {k: x[s] for k, s in self.slices.items()}
        outs = []
        for rf in self.sizes:
            acc = jnp.zeros(self.sizes[rf], dtype=x.dtype)
            for cf in self.sizes:
                blk = self.blocks.get((rf, cf))
                if blk is not None:
                    acc = acc + blk.matvec(segs[cf])
            outs.append(acc)
        return jnp.concatenate(outs)

    def __matmul__(self, x):
        return self.matvec(x)
