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
Tall-skinny blocks (P1 rows x P2 cols, e.g. divergence rows) use the
``Transposed`` wrapper: the transpose is banded under a row embedding and
is applied with ``rmatvec``.

Large diagonal counts are applied with a chunked ``lax.scan`` (dynamic
slice starts) instead of a fully unrolled fused loop, bounding the XLA
graph size; small counts unroll for maximum fusion.

Reference parity: replaces createSubMatrix products (lib/Preconditioner.py
60-75) and MatMult throughout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

# diagonals <= UNROLL_MAX are applied as a fully unrolled (XLA-fused)
# slice loop; more are applied as a lax.scan over chunks of CHUNK.
# The unrolled path's slice starts are STATIC, which GSPMD lowers to
# neighbor collective-permutes on a row-sharded mesh; the scan path's
# traced starts force full-vector all-gathers (HLO-audited).  384 covers
# every production operator (2D blocks 43-176 diagonals, 3D fine ops 240,
# 3D prolongators 368) so the sharded solve stays gather-free; scan
# remains the guard for pathological diagonal counts.
UNROLL_MAX = int(os.environ.get("PORO_DIA_UNROLL", "384"))
CHUNK = int(os.environ.get("PORO_DIA_CHUNK", "16"))


@jax.tree_util.register_pytree_node_class
class DIA:
    """Banded matrix with static diagonal offsets (gather-free SpMV).

    data: (nd, nrows) — data[d, i] = A[i, j] where emb(j) = i + offsets[d]
    offsets: static tuple[int]
    col_emb: optional (ncols,) int32 — embedding of column indices into row
        space; None means emb = identity (ncols-dim input read in place).
    """

    def __init__(self, data, offsets, nrows, ncols, col_emb=None, ne=None):
        self.data = data
        self.offsets = tuple(int(o) for o in offsets)
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.col_emb = col_emb
        if ne is None:
            # static size of the embedded input space; col_emb must be a
            # concrete array here (construction time, not trace time)
            if col_emb is None:
                ne = self.ncols
            else:
                ne = max(self.nrows, int(np.max(np.asarray(col_emb))) + 1)
        self.ne = int(ne)

    def tree_flatten(self):
        return (self.data, self.col_emb), (
            self.offsets,
            self.nrows,
            self.ncols,
            self.ne,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, col_emb = children
        offsets, nrows, ncols, ne = aux
        return cls(data, offsets, nrows, ncols, col_emb, ne)

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
        nd = max(len(offsets), 1)
        # pad the diagonal count to a CHUNK multiple when the scan path will
        # be used (zero rows contribute nothing; offset 0 keeps pads legal)
        nd_store = nd if nd <= UNROLL_MAX else ((nd + CHUNK - 1) // CHUNK) * CHUNK
        didx = np.searchsorted(offsets, off)
        # fill directly in the target dtype: the host VM pays first-touch
        # page faults at ~12 MB/s, so avoid a second full-size f64 temporary
        np_dtype = np.dtype(jnp.zeros((), dtype=dtype).dtype)
        data = np.zeros((nd_store, n), dtype=np_dtype)
        data[didx, coo.row] = coo.data
        offs = list(int(o) for o in offsets) or [0]
        offs += [0] * (nd_store - len(offs))
        emb = None if col_emb is None else jnp.asarray(col_emb, dtype=jnp.int32)
        return cls(jnp.asarray(data), tuple(offs), n, m, emb)

    # -- padding bookkeeping --------------------------------------------

    def _emb_size(self):
        # static size of the embedded input space (computed at construction)
        return self.ne

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
        nd = self.data.shape[0]
        y = jnp.zeros(self.nrows, dtype=x.dtype)
        if nd <= UNROLL_MAX:
            for d, o in enumerate(self.offsets):
                y = y + self.data[d] * jax.lax.dynamic_slice(
                    xpad, (lo + o,), (self.nrows,)
                )
            return y
        # scan path: CHUNK diagonals per step, dynamic slice starts
        starts = jnp.asarray(
            [lo + o for o in self.offsets], dtype=jnp.int32
        ).reshape(-1, CHUNK)
        dchunks = self.data.reshape(-1, CHUNK, self.nrows)

        def body(y, args):
            dat, st = args
            for j in range(CHUNK):
                y = y + dat[j] * jax.lax.dynamic_slice(
                    xpad, (st[j],), (self.nrows,)
                )
            return y, None

        y, _ = jax.lax.scan(body, y, (dchunks, starts))
        return y

    def rmatvec(self, x: jax.Array) -> jax.Array:
        """A^T @ x as a sum of shifted static slices (scatter-free).

        (A^T x)[i+o] += data[d, i] * x[i]  =>  y = sum_d shift(data[d]*x, o),
        i.e. the transpose is the same gather-free shifted-slice sweep as
        ``matvec``, only shifting the *product* instead of the input.  Pure
        shifted reads: under a row-sharded mesh GSPMD lowers them to
        neighbor collective-permutes (an earlier read-modify-write
        formulation with dynamic_update_slice forced full-vector
        all-gathers every application).
        """
        lo, hi, ne = self._pads()
        # pad x and data ONCE, then read a shifted window per diagonal
        # (the pad-once / slice-many structure GSPMD lowers to neighbor
        # collective-permutes, exactly like matvec; per-diagonal pads or
        # read-modify-write accumulators both degrade to all-gathers):
        # window for offset o is [plo - o, plo - o + ne)
        plo = max(max(self.offsets), 0)
        phi = max(0, ne - min(self.offsets) - self.nrows)
        xpad = jnp.pad(x, (plo, phi))
        dpad = jnp.pad(self.data, ((0, 0), (plo, phi)))
        nd = self.data.shape[0]
        y = jnp.zeros(ne, dtype=x.dtype)
        if nd <= UNROLL_MAX:
            for d, o in enumerate(self.offsets):
                y = y + jax.lax.dynamic_slice(
                    dpad[d], (plo - o,), (ne,)
                ) * jax.lax.dynamic_slice(xpad, (plo - o,), (ne,))
        else:
            starts = jnp.asarray(
                [plo - o for o in self.offsets], dtype=jnp.int32
            ).reshape(-1, CHUNK)
            dchunks = dpad.reshape(-1, CHUNK, dpad.shape[1])

            def body(y, args):
                dat, st = args
                for j in range(CHUNK):
                    y = y + jax.lax.dynamic_slice(
                        dat[j], (st[j],), (ne,)
                    ) * jax.lax.dynamic_slice(xpad, (st[j],), (ne,))
                return y, None

            y, _ = jax.lax.scan(body, y, (dchunks, starts))
        if self.col_emb is not None:
            return y[self.col_emb]
        return y[: self.ncols]

    def __matmul__(self, x):
        return self.matvec(x)

    def to_dense(self) -> np.ndarray:
        ne = self._emb_size()
        out = np.zeros((self.nrows, ne + 1 + max(max(self.offsets), 0)))
        d = np.asarray(self.data, dtype=np.float64)
        rows = np.arange(self.nrows)
        for k, o in enumerate(self.offsets):
            cols = rows + o
            ok = (cols >= 0) & (cols < out.shape[1])
            out[rows[ok], cols[ok]] += d[k, ok]
        out = out[:, :ne]
        if self.col_emb is not None:
            return out[:, np.asarray(self.col_emb)]
        return out[:, : self.ncols]


@jax.tree_util.register_pytree_node_class
class Transposed:
    """Apply the transpose of a stored operator: matvec <-> rmatvec.

    Lets tall-skinny blocks (few rows, many columns — e.g. pressure-row
    divergence blocks) store their banded transpose as DIA instead of
    falling back to the gather-path ELL.
    """

    def __init__(self, inner):
        self.inner = inner

    def tree_flatten(self):
        return (self.inner,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        s = self.inner.shape
        return (s[1], s[0])

    @property
    def nnz(self):
        return self.inner.nnz

    @property
    def nnz_padded(self):
        return self.inner.nnz_padded

    def matvec(self, x):
        return self.inner.rmatvec(x)

    def rmatvec(self, x):
        return self.inner.matvec(x)

    def __matmul__(self, x):
        return self.matvec(x)

    def to_dense(self):
        return self.inner.to_dense().T


@jax.tree_util.register_pytree_node_class
class Dense:
    """Small dense device matrix (MXU matvec).

    The right format for AMG coarse-level operators whose Galerkin fill
    defeats banded storage: a dense matvec streams n*m elements through the
    MXU, while the equivalent padded-ELL gather runs two orders of
    magnitude slower (see ops/dia.py module docstring).
    """

    def __init__(self, data):
        self.data = data

    def tree_flatten(self):
        return (self.data,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def from_csr(cls, A: sp.spmatrix, dtype=jnp.float32):
        return cls(jnp.asarray(A.toarray(), dtype=dtype))

    @property
    def shape(self):
        return self.data.shape

    @property
    def nnz(self):
        return self.data.size

    @property
    def nnz_padded(self):
        return self.data.size

    def matvec(self, x):
        return self.data @ x

    def rmatvec(self, x):
        return x @ self.data

    def __matmul__(self, x):
        return self.matvec(x)

    def to_dense(self):
        return np.asarray(self.data, dtype=np.float64)


def _dia_cost(A: sp.coo_matrix, emb, max_diags):
    """Streaming cost (stored elements) of DIA storage, or None."""
    ecol = A.col if emb is None else emb[A.col]
    offsets = np.unique(ecol.astype(np.int64) - A.row)
    if len(offsets) > max_diags:
        return None
    return len(offsets) * A.shape[0]


def device_matrix(
    A: sp.spmatrix,
    dtype=jnp.float32,
    col_emb: np.ndarray | None = None,
    row_emb: np.ndarray | None = None,
    max_diags: int = 1024,
    dense_max: int = 16_000_000,
):
    """Pick the device format for a host CSR matrix by streaming cost.

    Candidates: DIA (direct, with optional ``col_emb``), the banded
    transpose via ``Transposed`` (optional ``row_emb`` embedding this
    matrix's rows into its column space), small dense (MXU), and the
    gather-path ELL as last resort.  Cost model: stored elements streamed
    per matvec, with the gather path penalized by its measured ~50x
    per-element slowdown.
    """
    from .sparse import ELL

    A = A.tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    n, m = A.shape
    coo = A.tocoo()
    if coo.nnz == 0:
        return DIA(jnp.zeros((1, n), dtype=dtype), (0,), n, m, None)

    candidates = []  # (cost, order, builder)
    c = _dia_cost(coo, col_emb, max_diags)
    if c is not None:
        candidates.append((c, 0, lambda: DIA.from_csr(A, dtype, col_emb=col_emb)))
    At = A.T.tocsr()
    ct = _dia_cost(At.tocoo(), row_emb, max_diags)
    if ct is not None:
        candidates.append(
            (ct, 1, lambda: Transposed(DIA.from_csr(At, dtype, col_emb=row_emb)))
        )
    if n * m <= dense_max:
        candidates.append((n * m, 2, lambda: Dense.from_csr(A, dtype)))
    # ELL: padded nnz, gather penalty ~50x per element
    counts = np.diff(A.indptr)
    L = max(int(counts.max()) if n else 1, 1)
    candidates.append((50 * n * L, 3, lambda: ELL.from_csr(A, dtype)))
    candidates.sort(key=lambda t: (t[0], t[1]))
    return candidates[0][2]()
