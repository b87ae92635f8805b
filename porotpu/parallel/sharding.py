"""Device-mesh sharding of the solver state (the MPI replacement).

The reference's one parallelism strategy is MPI domain decomposition: a
1-D row partition of matrices and vectors with PETSc-internal halo
exchange and allreduce (SURVEY.md §2.5).  The TPU-native equivalent is a
1-D device mesh with GSPMD sharding annotations:

- matrix rows and all solver vectors are sharded over the "rows" mesh
  axis (block-row partition = mesh partition);
- the production SpMV format is DIA (ops/dia.py): row-divisible banded
  blocks get the **aggregated halo exchange** (`dist=("halo", mesh)`):
  a shard_map that ppermutes ONE left + ONE right boundary slab of width
  max|offset| per product and then runs the whole shifted-slice sweep on
  local arrays — exactly PETSc MatMult's single VecScatter per product
  (lib/AAR.py:135).  2 collective-permutes per matvec, independent of
  diagonal count (pinned by tests/test_parallel.py::
  test_sharded_dia_halo_is_aggregated; the earlier pure-GSPMD lowering
  paid one permute per stored diagonal — 30,349 in the dryrun program).
  Blocks whose halo slab exceeds a shard fall back to `("gspmd",)`:
  unrolled static slices that GSPMD lowers to per-diagonal neighbor
  permutes (correct, gather-free, more latency);
- rectangular embedded blocks (P1->P2, prolongators) scatter their SMALL
  input into the row lattice; GSPMD gathers the small side — the analogue
  of PETSc's VecScatter of the (much smaller) coarse/P1 vector, bounded by
  the small space size rather than the system size;
- the gather ``x[cols]`` in the legacy ELL fallback is the one remaining
  all-gather producer (non-banded blocks only);
- dot products / norms lower to psum collectives (MPI_Allreduce);
- the Krylov basis (m+1, n) is sharded over n, so CGS2 orthogonalization
  becomes a sharded matmul + psum;
- small operators (Givens state, Gram systems, dense coarse/LU factors,
  Schur blocks) stay replicated.

Everything here only *annotates* the existing solver pytrees — the jitted
solve is unchanged; XLA partitions the whole while_loop body.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dia import DIA, Dense, Transposed
from ..ops.sparse import ELL, FieldMatrix
from ..precond.amg import AMG, AMGLevel
from ..precond.block import BlockPreconditioner, CastPC
from ..precond.inner import InnerSolver
from ..precond.schur import SchurFieldsplit


def solver_mesh(
    n_devices: int | None = None, devices=None, n_hosts: int | None = None
) -> Mesh:
    """Mesh over the row-partition axis.

    1-D ``("rows",)`` by default.  With ``n_hosts`` > 1, a 2-D
    ``("hosts", "chips")`` mesh for multi-host pods: the row partition
    shards over BOTH axes host-major, so every host owns one contiguous
    slab of the lattice and — under the lexicographic numbering — only
    the two slab-boundary halo planes per host cross DCN; all interior
    halo collective-permutes stay on ICI.  This is the MPI-rank ≡
    (node, local-rank) layout of the reference's `mpirun -np N` runs
    (SURVEY.md §2.5) expressed as a GSPMD mesh; the solver code is
    unchanged (it carries no axis names — see module docstring).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    if n_hosts is not None and n_hosts > 1:
        if len(devices) % n_hosts:
            raise ValueError(
                f"solver_mesh: {len(devices)} devices do not divide into "
                f"{n_hosts} hosts"
            )
        arr = np.array(devices).reshape(n_hosts, -1)
        # on real multi-host hardware the host-major reshape must group
        # devices by owning process, or the "hosts" axis rides ICI and the
        # "chips" axis rides DCN — exactly backwards
        if jax.process_count() > 1:
            pids = np.array([d.process_index for d in arr.ravel()]).reshape(
                arr.shape
            )
            if not all(len(set(row)) == 1 for row in pids):
                raise ValueError(
                    "solver_mesh: device list is not process-major; each "
                    "hosts-row must belong to a single process "
                    f"(got process grid {pids.tolist()})"
                )
        return Mesh(arr, ("hosts", "chips"))
    return Mesh(np.array(devices), ("rows",))


def _row_axes(mesh: Mesh):
    """The mesh axes the row dimension shards over (all of them, major
    first: host-contiguous slabs on multi-host meshes)."""
    return tuple(mesh.axis_names)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_vector(x, mesh: Mesh):
    """Row-shard a vector; lengths that don't divide the mesh are replicated.

    The non-divisible case is AMG coarse-level data (dinv, masks) whose
    sizes follow the aggregation, not the mesh padding.  Replicating small
    coarse levels (their operators are already replicated by shard_ell's
    identical guard) is the deliberate design choice — the analogue of
    PETSc/hypre coarse-grid agglomeration onto few ranks: at a few thousand
    rows the per-level collectives of a distributed V-cycle are pure
    latency, while replicated smoothing is a trivially parallel local op.
    """
    if getattr(x, "ndim", 1) == 0 or x.shape[0] % mesh.size:
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.device_put(x, NamedSharding(mesh, P(_row_axes(mesh))))


def shard_ell(E, mesh: Mesh):
    """Row-partition a device matrix over the mesh (cols stay global).

    ELL stores rows on axis 0, DIA on axis 1 (data is (n_diags, nrows));
    Transposed shards its inner matrix.  Shapes not divisible by the mesh
    size (small AMG coarse levels) are replicated instead.
    """

    def _put(arr, spec):
        axis = spec.index("rows") if "rows" in spec else None
        if axis is not None and arr.shape[axis] % mesh.size:
            return jax.device_put(arr, NamedSharding(mesh, P()))
        spec = tuple(_row_axes(mesh) if s == "rows" else s for s in spec)
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    if isinstance(E, Transposed):
        return Transposed(shard_ell(E.inner, mesh))
    if isinstance(E, Dense):
        return Dense(_put(E.data, ("rows", None)))
    if isinstance(E, DIA):
        emb = E.col_emb
        if emb is not None:
            emb = jax.device_put(emb, NamedSharding(mesh, P()))
        if E.nrows % mesh.size:
            # mesh-indivisible (AMG coarse levels): replicate — the
            # coarse-grid-agglomeration convention (see shard_vector)
            return DIA(
                jax.device_put(E.data, NamedSharding(mesh, P())),
                E.offsets, E.nrows, E.ncols, emb, E.ne, dist=("repl",),
            )
        # halo path eligibility: the embedded input space must shard
        # exactly like the rows (ne == nrows; square when col_emb=None),
        # and the boundary slab of width max|offset| must fit one shard
        # so a single-hop neighbor exchange suffices
        nloc = E.nrows // mesh.size
        hl = max(0, -min(E.offsets))
        hr = max(0, max(E.offsets))
        halo_ok = E.ne == E.nrows and hl <= nloc and hr <= nloc
        dist = ("halo", mesh) if halo_ok else ("gspmd",)
        return DIA(
            _put(E.data, (None, "rows")), E.offsets, E.nrows, E.ncols, emb,
            E.ne, dist=dist,
        )
    return ELL(
        _put(E.data, ("rows", None)), _put(E.cols, ("rows", None)), E.ncols
    )


def _shard_inner(solver: InnerSolver, mesh: Mesh) -> InnerSolver:
    """Shard an inner solver: large per-row data over rows, dense factors
    replicated."""
    k = solver.kind
    pl = solver.payload
    out = dict(pl)
    if k in ("jacobi", "chebyshev", "cg"):
        if "A" in out:
            out["A"] = shard_ell(out["A"], mesh)
        if "dinv" in out:
            out["dinv"] = shard_vector(out["dinv"], mesh)
    elif k == "lu":
        out = replicate(out, mesh)
    elif k in ("amg", "cg+amg"):
        out["A"] = shard_ell(out["A"], mesh)
        out["amg"] = shard_amg(out["amg"], mesh)
    elif k == "plus-diag":
        out["base"] = _shard_inner(out["base"], mesh)
        out["wdiag"] = shard_vector(out["wdiag"], mesh)
    return InnerSolver(
        k, out, solver.iters, solver.lmax, solver.cheb_frac,
        solver.monitor, solver.label,
    )


def _replicate_op(E, mesh: Mesh):
    """Replicate a device operator and mark DIA dists as ("repl",)."""
    if isinstance(E, Transposed):
        return Transposed(_replicate_op(E.inner, mesh))
    if isinstance(E, DIA):
        put = lambda a: (
            None if a is None else jax.device_put(a, NamedSharding(mesh, P()))
        )
        return DIA(
            put(E.data), E.offsets, E.nrows, E.ncols, put(E.col_emb),
            E.ne, dist=("repl",), dataT=put(E.dataT),
        )
    return jax.device_put(E, NamedSharding(mesh, P()))


def shard_amg(amg: AMG, mesh: Mesh) -> AMG:
    """Level 0 row-sharded; levels >= 1 and dense coarse factors replicated.

    Coarse-grid agglomeration policy, now EXPLICIT: through round 4 the
    coarse levels were replicated by accident of size (mesh-indivisible
    rows hit shard_ell's replicate branch); the round-5 row-padding to
    128 makes them divisible, and sharding them would put the wide-band
    Galerkin operators on the fully-unrolled per-diagonal gspmd fallback
    (their halo slab exceeds a shard) — measured 124,468 collective-
    permutes in the 8-device dryrun program vs ~600 with levels >= 1
    replicated.  Coarse work is tiny; replication is the right layout.
    """
    levels = []
    for li, lvl in enumerate(amg.levels):
        if li == 0:
            levels.append(
                AMGLevel(
                    shard_ell(lvl.A, mesh),
                    shard_ell(lvl.P, mesh),
                    shard_vector(lvl.dinv, mesh),
                    lvl.lmax,
                )
            )
        else:
            levels.append(
                AMGLevel(
                    _replicate_op(lvl.A, mesh),
                    _replicate_op(lvl.P, mesh),
                    replicate(lvl.dinv, mesh),
                    lvl.lmax,
                )
            )
    return AMG(
        levels,
        replicate(amg.coarse_inv, mesh),
        amg.presmooth,
        amg.postsmooth,
        amg.cheb_lower,
    )


def shard_operator(op, mesh: Mesh):
    """Shard any solver-side operator pytree for mesh execution."""
    if isinstance(op, (ELL, DIA, Dense, Transposed)):
        return shard_ell(op, mesh)
    if isinstance(op, FieldMatrix):
        return FieldMatrix(
            {k: shard_ell(v, mesh) for k, v in op.blocks.items()}, op.sizes
        )
    if isinstance(op, InnerSolver):
        return _shard_inner(op, mesh)
    if isinstance(op, SchurFieldsplit):
        return SchurFieldsplit(
            op.nf,
            _shard_inner(op.solve_f, mesh),
            _shard_inner(op.solve_S, mesh),
            shard_ell(op.Apf, mesh),
        )
    if isinstance(op, CastPC):
        return CastPC(shard_operator(op.inner, mesh), op.out_dtype, op.in_dtype)
    if isinstance(op, BlockPreconditioner):
        sh = lambda x: shard_operator(x, mesh) if x is not None else None
        shv = lambda x: shard_vector(x, mesh) if x is not None else None
        return BlockPreconditioner(
            op.ns,
            op.nf,
            op.np_,
            op.three_way,
            sh(op.solve_s),
            solve_fp=sh(op.solve_fp),
            Pfs=sh(op.Pfs),
            Pps=sh(op.Pps),
            solve_f=sh(op.solve_f),
            solve_p=sh(op.solve_p),
            solve_diff=sh(op.solve_diff),
            Pfp=sh(op.Pfp),
            Psf=sh(op.Psf),
            Psp=sh(op.Psp),
            diff_rhs_mask=shv(op.diff_rhs_mask),
            w1=op.w1,
            w2=op.w2,
        )
    # fallback: replicate
    return replicate(op, mesh)
