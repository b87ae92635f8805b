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

Distributed execution (``dist`` static tag, set by parallel.shard_ell):

- ``("halo", mesh)`` — the production sharded path: a ``shard_map`` over
  the row mesh exchanges ONE left and ONE right boundary slab of width
  max|offset| per product (two ``ppermute``s), then runs the whole
  shifted-slice sweep on purely LOCAL arrays.  This is the aggregated
  halo exchange of PETSc MatMult's single VecScatter per product
  (lib/AAR.py:135, SURVEY §2.5) — previously each diagonal's shifted
  slice lowered to its own collective-permute under GSPMD (~240
  exchanges per 3D matvec).
- ``("gspmd",)`` — row-sharded fallback when the halo slab does not fit
  one shard (or the embedding space differs from the row space): fully
  unrolled static-slice sweep, which GSPMD lowers to per-diagonal
  neighbor collective-permutes (correct, gather-free, more latency).
- ``("repl",)`` / ``None`` — replicated / single-device: slices are
  local, so large diagonal counts use a chunked ``lax.scan`` (dynamic
  slice starts) instead of a fully unrolled loop, bounding the XLA graph
  size (and therefore compile time); small counts unroll for fusion.

Reference parity: replaces createSubMatrix products (lib/Preconditioner.py
60-75) and MatMult throughout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import PartitionSpec as P

# Unroll/scan thresholds for the shifted-slice sweep.
# - UNROLL_MAX guards the ("gspmd",) row-sharded fallback: that path's
#   scan would use traced slice starts, which GSPMD lowers to full-vector
#   all-gathers (HLO-audited), so it stays fully unrolled up to 384
#   diagonals (covers all production operators: 2D blocks 43-176, 3D fine
#   ops 240, 3D prolongators 368).
# - UNROLL_LOCAL applies when slices are provably local (single-device,
#   replicated, or inside the shard_map halo path): above it the sweep
#   runs as a lax.scan over CHUNK-diagonal chunks, shrinking the HLO by
#   ~nd/CHUNK and with it XLA compile time.  Default = CHUNK: the scan
#   path is MEASURED FASTER than the fully-unrolled sweep on the real
#   chip at every production shape tried (204 vs 142 GB/s at nd=233 f32,
#   116 vs 71 at nd=48 — PERF.md), on top of the compile-time win.
UNROLL_MAX = int(os.environ.get("PORO_DIA_UNROLL", "384"))
UNROLL_LOCAL = int(os.environ.get("PORO_DIA_UNROLL_LOCAL", "16"))
CHUNK = int(os.environ.get("PORO_DIA_CHUNK", "16"))


def _varying(y, vary):
    """Mark a freshly-created array as varying over shard_map mesh axes.

    lax.scan requires carry input/output types to match; inside a
    shard_map body the accumulator must be explicitly cast to varying
    before it can carry per-shard values."""
    if vary:
        return jax.lax.pcast(y, vary, to="varying")
    return y


def _mv_sweep(data, offsets, xpad, base, n, unroll, vary=(), row0=0):
    """y[i] = sum_d data[d, row0 + i] * xpad[base + offsets[d] + i],
    i in [0, n).

    Unrolled static slices up to ``unroll`` diagonals; above that a
    lax.scan over CHUNK-diagonal chunks (+ an unrolled remainder tail).
    ``row0`` windows the data rows IN PLACE (per-diagonal fused slices) —
    slicing the (nd, nrows) array up front would materialize a copy of
    the whole data stream before the scan consumed it.
    """
    nd = data.shape[0]
    whole = row0 == 0 and n == data.shape[1]

    def drow(row):
        return row if whole else jax.lax.dynamic_slice(row, (row0,), (n,))

    y = _varying(jnp.zeros(n, dtype=xpad.dtype), vary)
    if nd <= unroll:
        for d, o in enumerate(offsets):
            y = y + drow(data[d]) * jax.lax.dynamic_slice(
                xpad, (base + o,), (n,)
            )
        return y
    nmain = (nd // CHUNK) * CHUNK
    starts = jnp.asarray(
        [base + o for o in offsets[:nmain]], dtype=jnp.int32
    ).reshape(-1, CHUNK)
    dchunks = data[:nmain].reshape(-1, CHUNK, data.shape[1])

    def body(y, args):
        dat, st = args
        for j in range(CHUNK):
            y = y + drow(dat[j]) * jax.lax.dynamic_slice(xpad, (st[j],), (n,))
        return y, None

    y, _ = jax.lax.scan(body, y, (dchunks, starts))
    for d in range(nmain, nd):
        y = y + drow(data[d]) * jax.lax.dynamic_slice(
            xpad, (base + offsets[d],), (n,)
        )
    return y


def _rmv_sweep(dpad, offsets, xpad, base, m, unroll, vary=()):
    """y[k] = sum_d dpad[d, base - offsets[d] + k] * xpad[base - offsets[d] + k].

    The transpose sweep: both the (padded) data row and the (padded)
    input are read through the same shifted window.  Same unroll/scan
    structure as _mv_sweep.
    """
    nd = dpad.shape[0]
    y = _varying(jnp.zeros(m, dtype=xpad.dtype), vary)
    if nd <= unroll:
        for d, o in enumerate(offsets):
            st = base - o
            y = y + jax.lax.dynamic_slice(dpad[d], (st,), (m,)) * (
                jax.lax.dynamic_slice(xpad, (st,), (m,))
            )
        return y
    nmain = (nd // CHUNK) * CHUNK
    starts = jnp.asarray(
        [base - o for o in offsets[:nmain]], dtype=jnp.int32
    ).reshape(-1, CHUNK)
    dchunks = dpad[:nmain].reshape(-1, CHUNK, dpad.shape[1])

    def body(y, args):
        dat, st = args
        for j in range(CHUNK):
            y = y + jax.lax.dynamic_slice(dat[j], (st[j],), (m,)) * (
                jax.lax.dynamic_slice(xpad, (st[j],), (m,))
            )
        return y, None

    y, _ = jax.lax.scan(body, y, (dchunks, starts))
    for d in range(nmain, nd):
        st = base - offsets[d]
        y = y + jax.lax.dynamic_slice(dpad[d], (st,), (m,)) * (
            jax.lax.dynamic_slice(xpad, (st,), (m,))
        )
    return y


@jax.tree_util.register_pytree_node_class
class DIA:
    """Banded matrix with static diagonal offsets (gather-free SpMV).

    data: (nd, nrows) — data[d, i] = A[i, j] where emb(j) = i + offsets[d]
    offsets: static tuple[int]
    col_emb: optional (ncols,) int32 — embedding of column indices into row
        space; None means emb = identity (ncols-dim input read in place).
    dist: static distribution tag (see module docstring): None,
        ("repl",), ("gspmd",), or ("halo", Mesh).
    dataT: optional (nd, ne) transposed-layout copy —
        dataT[d, i + offsets[d]] = data[d, i] — built at construction
        (``store_transpose``) for operators whose rmatvec is hot
        (prolongator restrictions, Transposed coupling blocks): the
        transpose of a banded matrix is banded with negated offsets, so
        rmatvec dispatches the SAME 831 GB/s Pallas forward kernel on
        (dataT, -offsets) instead of the slot-accumulation transpose
        kernel (measured 6.6x slower — VPU-bound on per-residue
        rotations).  Costs one extra copy of the operator stream; the
        sharded paths drop it (parallel/sharding.py rebuilds without).
    """

    def __init__(
        self, data, offsets, nrows, ncols, col_emb=None, ne=None, dist=None,
        dataT=None,
    ):
        self.data = data
        self.dataT = dataT
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
        self.dist = dist

    def tree_flatten(self):
        return (self.data, self.col_emb, self.dataT), (
            self.offsets,
            self.nrows,
            self.ncols,
            self.ne,
            self.dist,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, col_emb, dataT = children
        offsets, nrows, ncols, ne, dist = aux
        return cls(data, offsets, nrows, ncols, col_emb, ne, dist, dataT)

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
        store_transpose: bool = False,
    ) -> "DIA | None":
        """Convert CSR to DIA. Returns None if the diagonal count exceeds
        ``max_diags`` (caller falls back to ELL).

        ``store_transpose``: also build the transposed-layout ``dataT``
        (one extra scatter — same cost as the data fill) so rmatvec rides
        the Pallas forward kernel; only meaningful for f32 (the kernel's
        eligible dtype), silently skipped otherwise.
        """
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
        didx = np.searchsorted(offsets, off)
        # fill directly in the target dtype: the host VM pays first-touch
        # page faults at ~12 MB/s, so avoid a second full-size f64 temporary
        np_dtype = np.dtype(jnp.zeros((), dtype=dtype).dtype)
        data = np.zeros((nd, n), dtype=np_dtype)
        data[didx, coo.row] = coo.data
        offs = list(int(o) for o in offsets) or [0]
        emb = None if col_emb is None else jnp.asarray(col_emb, dtype=jnp.int32)
        dataT = None
        if store_transpose and np_dtype == np.float32:
            # embedded-column size, matching the class ne semantics (ncols
            # when there is no embedding — rectangular blocks index columns
            # beyond nrows)
            ne = m if col_emb is None else max(n, int(col_emb.max()) + 1)
            dT = np.zeros((nd, ne), dtype=np_dtype)
            dT[didx, ecol] = coo.data
            dataT = jnp.asarray(dT)
        return cls(jnp.asarray(data), tuple(offs), n, m, emb, dataT=dataT)

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

    def _unroll_limit(self):
        # slices are provably shard-local on single-device / replicated
        # data (and inside the shard_map halo body); the gspmd fallback
        # must stay unrolled — its scan's traced slice starts would lower
        # to full-vector all-gathers under GSPMD
        if self.dist is None or self.dist[0] in ("repl", "halo"):
            return UNROLL_LOCAL
        return UNROLL_MAX

    # -- halo-exchange (shard_map) path ---------------------------------

    def _halo_widths(self):
        offs = self.offsets
        return max(0, -min(offs)), max(0, max(offs))

    def _mesh_axes(self):
        mesh = self.dist[1]
        return mesh, tuple(mesh.axis_names)

    def _linear_shard_index(self, mesh, axes):
        s = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            s = s * mesh.shape[a] + jax.lax.axis_index(a)
        return s

    def _halo_matvec(self, x: jax.Array) -> jax.Array:
        """One aggregated boundary-slab exchange per matvec, OVERLAPPED
        with the interior sweep.

        Each shard ppermutes its trailing ``hl`` entries right and its
        leading ``hr`` entries left (edge shards receive zeros — exactly
        the global zero padding).  2 collective-permutes per product,
        independent of diagonal count.  The sweep is split so the
        permutes can fly under compute (the PETSc MatMult
        VecScatterBegin/End-around-local-diagonal overlap, reference
        lib/AAR.py:135, SURVEY §2.5):

        - interior rows [hl, nloc-hr) read ONLY the local x — this sweep
          has no data dependence on either permute, so XLA's
          latency-hiding scheduler hoists it between the
          collective-permute-start/done pair (asserted on the scheduled
          TPU HLO in tests/test_parallel.py);
        - the hl top rows / hr bottom rows are fixed up with two small
          boundary sweeps that consume the received slabs.
        """
        mesh, axes = self._mesh_axes()
        nsh = mesh.size
        nloc = self.nrows // nsh
        hl, hr = self._halo_widths()
        offs = self.offsets
        fwd = [(i, i + 1) for i in range(nsh - 1)]
        bwd = [(i + 1, i) for i in range(nsh - 1)]

        from . import pallas_dia

        # Pallas under shard_map: when the LOCAL shard is 128-aligned f32
        # (pad multiple = 128 * n_devices), the interior runs through the
        # streaming kernel — a full-local kernel sweep reading xloc with
        # zero-extended edges; the hl/hr boundary rows it produces are
        # wrong (they need the halo slabs) and are REPLACED by the fix-up
        # sweeps, which recompute O(halo) rows — negligible — while the
        # kernel output stays independent of the permutes (overlap holds).
        use_kernel = (
            nloc % 128 == 0
            and self.data.dtype == jnp.float32
            and pallas_dia.enabled()
        )

        def sweep_split(data, xloc):
            # start both permutes first; nothing below depends on them
            # until the boundary fix-ups
            left = (
                jax.lax.ppermute(xloc[nloc - hl :], axes, fwd) if hl else None
            )
            right = jax.lax.ppermute(xloc[:hr], axes, bwd) if hr else None
            ni = nloc - hl - hr  # interior rows
            parts = []
            if hl:
                # top rows [0, hl): read [left | xloc[: hl + hr]]
                xt = jnp.concatenate([left, xloc[: hl + hr]])
                parts.append(
                    _mv_sweep(data, offs, xt, hl, hl, UNROLL_LOCAL, vary=axes)
                )
            # interior rows [hl, nloc - hr): local-only reads
            if use_kernel:
                y_all = pallas_dia.mv(data, offs, xloc, nloc)
                parts.append(y_all[hl : nloc - hr])
            else:
                parts.append(
                    _mv_sweep(
                        data, offs, xloc, hl, ni, UNROLL_LOCAL, vary=axes,
                        row0=hl,
                    )
                )
            if hr:
                # bottom rows [nloc - hr, nloc): read [xloc[-(hl+hr):] | right]
                xb = jnp.concatenate([xloc[nloc - hr - hl :], right])
                parts.append(
                    _mv_sweep(
                        data, offs, xb, hl, hr, UNROLL_LOCAL, vary=axes,
                        row0=nloc - hr,
                    )
                )
            return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        def sweep_seq(data, xloc):
            # degenerate split (interior empty): sequential exchange+sweep
            parts = []
            if hl:
                parts.append(jax.lax.ppermute(xloc[nloc - hl :], axes, fwd))
            parts.append(xloc)
            if hr:
                parts.append(jax.lax.ppermute(xloc[:hr], axes, bwd))
            xpad = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            return _mv_sweep(data, offs, xpad, hl, nloc, UNROLL_LOCAL, vary=axes)

        body = sweep_split if nloc - hl - hr > 0 else sweep_seq

        if self.col_emb is None:

            def local(data, xloc):
                return body(data, xloc)

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, axes), P(axes)),
                out_specs=P(axes),
            )(self.data, x)

        def local(data, xsmall, emb):
            s = self._linear_shard_index(mesh, axes)
            idx = emb - s * nloc
            # negative traced indices WRAP in jax scatters (mode="drop"
            # only drops idx >= n) — remap every out-of-shard index to the
            # dropped sentinel nloc explicitly
            idx = jnp.where((idx >= 0) & (idx < nloc), idx, nloc)
            xloc = jnp.zeros(nloc, dtype=xsmall.dtype).at[idx].set(
                xsmall, mode="drop"
            )
            return body(data, xloc)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axes), P(), P()),
            out_specs=P(axes),
        )(self.data, x, self.col_emb)

    def _halo_rmatvec(self, x: jax.Array) -> jax.Array:
        """Transpose product with one aggregated overflow exchange.

        Each shard accumulates its rows' contributions into a local
        window [-L, nloc+R), then ppermutes the L-wide left overflow to
        its left neighbor and the R-wide right overflow to its right
        neighbor (2 collective-permutes).  Embedded (coarse) outputs are
        reduced with one small psum and returned replicated — the
        coarse-grid-agglomeration convention of parallel/sharding.py.
        """
        mesh, axes = self._mesh_axes()
        nsh = mesh.size
        nloc = self.nrows // nsh
        L, R = self._halo_widths()
        offs = self.offsets
        nacc = nloc + L + R
        pl = L + R  # window-read padding (see _rmv_sweep bound analysis)
        fwd = [(i, i + 1) for i in range(nsh - 1)]
        bwd = [(i + 1, i) for i in range(nsh - 1)]

        def accumulate(data, xloc):
            xp = jnp.pad(xloc, (pl, pl))
            dp = jnp.pad(data, ((0, 0), (pl, pl)))
            acc = _rmv_sweep(dp, offs, xp, pl - L, nacc, UNROLL_LOCAL, vary=axes)
            y = acc[L : L + nloc]
            if L:
                y = y.at[nloc - L :].add(jax.lax.ppermute(acc[:L], axes, bwd))
            if R:
                y = y.at[:R].add(jax.lax.ppermute(acc[L + nloc :], axes, fwd))
            return y

        if self.col_emb is None:

            def local(data, xloc):
                return accumulate(data, xloc)

            y = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, axes), P(axes)),
                out_specs=P(axes),
            )(self.data, x)
            return y[: self.ncols]  # ncols == ne == nrows on this path

        def local(data, xloc, emb):
            y = accumulate(data, xloc)
            s = self._linear_shard_index(mesh, axes)
            idx = emb - s * nloc
            valid = (idx >= 0) & (idx < nloc)
            vals = jnp.where(valid, y[jnp.clip(idx, 0, nloc - 1)], 0)
            return jax.lax.psum(vals, axes)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axes), P(axes), P()),
            out_specs=P(),
        )(self.data, x, self.col_emb)

    # -- products -------------------------------------------------------

    def _pallas_eligible(self, x) -> bool:
        """Kernel fast path (matvec AND rmatvec): real TPU, shard-local,
        128-aligned rows, f32.

        The driver/bench padded layout ("pad multiple") makes the
        production field blocks and level-0 AMG operators 128-aligned,
        and precond/amg.py row-pads the coarse levels to 128 so they
        qualify too; everything else (CPU tests, sharded gspmd/halo,
        f64 operands) takes the XLA sweep.
        """
        from . import pallas_dia

        return (
            (self.dist is None or self.dist[0] == "repl")
            and self.nrows % 128 == 0
            and self.ne == self.nrows
            and self.data.dtype == jnp.float32
            and x.dtype == jnp.float32
            and pallas_dia.enabled()
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        if self.dist is not None and self.dist[0] == "halo":
            return self._halo_matvec(x)
        lo, hi, ne = self._pads()
        if self.col_emb is not None:
            xe = jnp.zeros(ne, dtype=x.dtype).at[self.col_emb].set(x)
        else:
            xe = x
        if self._pallas_eligible(x):
            from . import pallas_dia

            return pallas_dia.mv(self.data, self.offsets, xe, self.nrows)
        xpad = jnp.pad(xe, (lo, hi))
        return _mv_sweep(
            self.data, self.offsets, xpad, lo, self.nrows, self._unroll_limit()
        )

    def rmatvec(self, x: jax.Array) -> jax.Array:
        """A^T @ x as a sum of shifted static slices (scatter-free).

        (A^T x)[i+o] += data[d, i] * x[i]  =>  y = sum_d shift(data[d]*x, o),
        i.e. the transpose is the same gather-free shifted-slice sweep as
        ``matvec``, only shifting the *product* instead of the input.
        Under the halo dist the overflow slabs are exchanged explicitly
        (_halo_rmatvec); under gspmd the shifted reads lower to neighbor
        collective-permutes (an earlier read-modify-write formulation
        with dynamic_update_slice forced full-vector all-gathers).
        """
        if self.dist is not None and self.dist[0] == "halo":
            return self._halo_rmatvec(x)
        if self._pallas_eligible(x):
            from . import pallas_dia

            if self.dataT is not None:
                # transposed layout: A^T is banded with negated offsets —
                # run the forward streaming kernel on (dataT, -offsets)
                y = pallas_dia.mv(
                    self.dataT,
                    tuple(-o for o in self.offsets),
                    x,
                    self.ne,
                )
            else:
                y = pallas_dia.rmv(self.data, self.offsets, x, self.nrows)
            if self.col_emb is not None:
                return y[self.col_emb]
            return y[: self.ncols]
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
        y = _rmv_sweep(
            dpad, self.offsets, xpad, plo, ne, self._unroll_limit()
        )
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
    need_rmatvec: bool = False,
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
        candidates.append(
            (c, 0, lambda: DIA.from_csr(
                A, dtype, col_emb=col_emb, store_transpose=need_rmatvec
            ))
        )
    At = A.T.tocsr()
    ct = _dia_cost(At.tocoo(), row_emb, max_diags)
    if ct is not None:
        # the Transposed wrapper's FORWARD product is the inner's rmatvec,
        # so the inner always stores the transposed layout (hot path)
        candidates.append(
            (ct, 1, lambda: Transposed(
                DIA.from_csr(At, dtype, col_emb=row_emb, store_transpose=True)
            ))
        )
    if n * m <= dense_max:
        candidates.append((n * m, 2, lambda: Dense.from_csr(A, dtype)))
    # ELL: padded nnz, gather penalty ~50x per element
    counts = np.diff(A.indptr)
    L = max(int(counts.max()) if n else 1, 1)
    candidates.append((50 * n * L, 3, lambda: ELL.from_csr(A, dtype)))
    candidates.sort(key=lambda t: (t[0], t[1]))
    return candidates[0][2]()
