"""DIA (diagonal/stencil) sparse storage — the TPU production SpMV format.

The reference's SpMV is PETSc CSR MatMult (lib/AAR.py:135).  On TPU both
CSR and padded-ELL need a gather of x, which XLA lowers to a scalar loop
(~0.15 Gnnz/s measured on v5e — two orders of magnitude under roofline).
DIA is gather-free:

    y[i] = sum_d data[d, i] * xpad[i + off_d]

i.e. one shifted *static slice* of x per stored diagonal — pure VPU
multiply-adds that XLA fuses into a streaming pass over ``data``
(measured ~100 GB/s on v5e, ~140x the gather path).

FEM matrices become banded under a **lattice-lexicographic node
numbering** (fem/dofmap.py): the swelling-3d P2 solid block needs 233
diagonals instead of 44,771 under first-come numbering.

Rectangular cross-space blocks (P2 rows x P1 cols, prolongators) are
handled by a **column embedding**: P1 vertices / coarse dofs are mapped to
unique slots of the row lattice (``col_emb``), the input is scattered into
that lattice once (small), and the shifted-slice sweep runs unchanged.

Reference parity: replaces createSubMatrix products (lib/Preconditioner.py
60-75) and MatMult throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
class DIA:
    """Banded matrix with static diagonal offsets (gather-free SpMV).

    data: (nd, nrows) — data[d, i] = A[i, j] where emb(j) = i + offsets[d]
    offsets: static tuple[int]
    col_emb: optional (ncols,) int32 — embedding of column indices into row
        space; None means emb = identity (ncols-dim input read in place).
    """

    def __init__(self, data, offsets, nrows, ncols, col_emb=None):
        self.data = data
        self.offsets = tuple(int(o) for o in offsets)
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.col_emb = col_emb

    def tree_flatten(self):
        return (self.data, self.col_emb), (self.offsets, self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, col_emb = children
        offsets, nrows, ncols = aux
        return cls(data, offsets, nrows, ncols, col_emb)

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def nnz(self):
        return self.data.size

    @property
    def nnz_padded(self):
        return self.data.size

    # -- construction -------------------------------------------------------

    @classmethod
    def from_csr(
        cls,
        A: sp.spmatrix,
        dtype=jnp.float32,
        col_emb: np.ndarray | None = None,
        max_diags: int | None = None,
    ) -> "DIA | None":
        """Convert CSR to DIA. Returns None if the diagonal count exceeds
        ``max_diags`` (caller falls back to ELL)."""
        A = A.tocsr()
        A.sum_duplicates()
        A.eliminate_zeros()
        n, m = A.shape
        coo = A.tocoo()
        ecol = coo.col if col_emb is None else col_emb[coo.col]
        off = ecol.astype(np.int64) - coo.row
        offsets = np.unique(off)
        if max_diags is not None and len(offsets) > max_diags:
            return None
        didx = np.searchsorted(offsets, off)
        data = np.zeros((max(len(offsets), 1), n), dtype=np.float64)
        data[didx, coo.row] = coo.data
        emb = None if col_emb is None else jnp.asarray(col_emb, dtype=jnp.int32)
        return cls(
            jnp.asarray(data, dtype=dtype),
            tuple(int(o) for o in offsets) or (0,),
            n,
            m,
            emb,
        )

    # -- padding bookkeeping --------------------------------------------

    def _emb_size(self):
        # size of the embedded input space (row-lattice size; at least
        # large enough to hold every embedded column slot)
        if self.col_emb is None:
            return self.ncols
        return self.nrows

    def _pads(self):
        offs = self.offsets
        ne = self._emb_size()
        lo = max(0, -min(offs))
        hi = max(0, self.nrows - 1 + max(offs) - (ne - 1))
        return lo, hi, ne

    # -- products -------------------------------------------------------

    def matvec(self, x: jax.Array) -> jax.Array:
        lo, hi, ne = self._pads()
        if self.col_emb is not None:
            xe = jnp.zeros(ne, dtype=x.dtype).at[self.col_emb].set(x)
        else:
            xe = x
        xpad = jnp.pad(xe, (lo, hi))
        y = jnp.zeros(self.nrows, dtype=x.dtype)
        for d, o in enumerate(self.offsets):
            y = y + self.data[d] * jax.lax.dynamic_slice(
                xpad, (lo + o,), (self.nrows,)
            )
        return y

    def rmatvec(self, x: jax.Array) -> jax.Array:
        """A^T @ x via shifted static-slice accumulation (scatter-free)."""
        lo, hi, ne = self._pads()
        acc = jnp.zeros(ne + lo + hi, dtype=x.dtype)
        for d, o in enumerate(self.offsets):
            seg = jax.lax.dynamic_slice(acc, (lo + o,), (self.nrows,))
            acc = jax.lax.dynamic_update_slice(
                acc, seg + self.data[d] * x, (lo + o,)
            )
        ye = jax.lax.dynamic_slice(acc, (lo,), (ne,))
        if self.col_emb is not None:
            return ye[self.col_emb]
        return ye

    def __matmul__(self, x):
        return self.matvec(x)

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.nrows, self._emb_size() + 1 + max(self.offsets)))
        d = np.asarray(self.data, dtype=np.float64)
        rows = np.arange(self.nrows)
        for k, o in enumerate(self.offsets):
            cols = rows + o
            ok = (cols >= 0) & (cols < out.shape[1])
            out[rows[ok], cols[ok]] += d[k, ok]
        ne = self._emb_size()
        out = out[:, :ne]
        if self.col_emb is not None:
            return out[:, np.asarray(self.col_emb)]
        return out[:, : self.ncols]


def device_matrix(
    A: sp.spmatrix,
    dtype=jnp.float32,
    col_emb: np.ndarray | None = None,
    max_diags: int = 2048,
    min_fill: float = 0.02,
):
    """Pick the device format for a host CSR matrix: DIA when the diagonal
    count is bounded and not catastrophically sparse, ELL otherwise."""
    from .sparse import ELL

    A = A.tocsr()
    n, m = A.shape
    coo = A.tocoo()
    if coo.nnz == 0:
        return DIA(jnp.zeros((1, n), dtype=dtype), (0,), n, m, None)
    ecol = coo.col if col_emb is None else col_emb[coo.col]
    offsets = np.unique(ecol.astype(np.int64) - coo.row)
    fill = coo.nnz / (len(offsets) * n)
    if len(offsets) <= max_diags and fill >= min_fill:
        return DIA.from_csr(A, dtype, col_emb=col_emb)
    if col_emb is not None:
        # embedding only matters for DIA; ELL gathers true columns
        pass
    return ELL.from_csr(A, dtype)
