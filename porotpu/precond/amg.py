"""Smoothed-aggregation algebraic multigrid (the hypre BoomerAMG replacement).

The reference's h-robustness comes from hypre BoomerAMG inner
preconditioners (petsc-options-inexact:16-69; SURVEY.md ranks replacing it
as hard part #1).  TPU-native design:

- **Setup on host** (scipy/numpy, once per operator): strength graph,
  greedy aggregation over *nodes* (dof blocks), tentative prolongator from
  a near-nullspace basis (rigid-body modes for elasticity), Jacobi
  prolongator smoothing, Galerkin coarse operators, dense LU at the
  coarsest level.
- **V-cycle on device** (pure JAX, static level count): Chebyshev/Jacobi
  smoothing + ELL SpMV transfers; everything jit-compatible with static
  shapes, usable inside the outer FGMRES while_loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp

from ..ops.dia import device_matrix
from ..ops.sparse import ELL


# ---------------------------------------------------------------------------
# setup (host)
# ---------------------------------------------------------------------------


def _node_graph(A: sp.csr_matrix, d: int) -> sp.csr_matrix:
    """Collapse a dof matrix with d dofs/node into a node connectivity graph.

    Native linear pass (collapse_node_graph) when available; spgemm pair
    Q^T |A| Q as fallback.
    """
    n = A.shape[0]
    if d == 1:
        return abs(A).tocsr()
    nn = n // d

    from ..native import get_lib

    lib = get_lib()
    if lib is not None and A.dtype == np.float64:
        nnz = A.nnz
        rows = np.empty(nnz, dtype=np.int32)
        cols = np.empty(nnz, dtype=np.int32)
        vals = np.empty(nnz, dtype=np.float64)
        indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(A.indices, dtype=np.int32)
        data = np.ascontiguousarray(A.data)
        lib.collapse_node_graph(
            indptr.ctypes.data,
            indices.ctypes.data,
            data.ctypes.data,
            n,
            d,
            rows.ctypes.data,
            cols.ctypes.data,
            vals.ctypes.data,
        )
        C = sp.coo_matrix((vals, (rows, cols)), shape=(nn, nn)).tocsr()
        C.sum_duplicates()
        return C

    rows = np.repeat(np.arange(nn), d)
    Q = sp.csr_matrix((np.ones(n), (np.arange(n), rows)), shape=(n, nn))
    return (Q.T @ abs(A) @ Q).tocsr()


def _strength(C: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Symmetric strength-of-connection: |c_ij| >= theta sqrt(c_ii c_jj)."""
    C = C.tocsr()
    diag = np.asarray(C.diagonal())
    diag[diag <= 0] = 1.0
    rows = np.repeat(np.arange(C.shape[0]), np.diff(C.indptr))
    thresh = theta * np.sqrt(diag[rows] * diag[C.indices])
    keep = (np.abs(C.data) >= thresh) & (rows != C.indices)
    S = sp.csr_matrix(
        (np.ones(keep.sum()), (rows[keep], C.indices[keep])), shape=C.shape
    )
    return S


def _aggregate(S: sp.csr_matrix) -> np.ndarray:
    """Greedy standard aggregation. Returns agg id per node (-1 none).

    Uses the native C++ kernel (porotpu/native/aggregation.cpp) when
    available — the sequential sweep is the host-setup hot spot at scale —
    with this numpy/python loop as the reference fallback.
    """
    n = S.shape[0]
    from ..native import greedy_aggregate

    res = greedy_aggregate(S.indptr, S.indices, n)
    if res is not None:
        return res[0]

    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = S.indptr, S.indices
    na = 0
    # pass 1: roots with fully free neighborhoods
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if np.all(agg[nbrs] == -1):
            agg[i] = na
            agg[nbrs] = na
            na += 1
    # pass 2: attach stragglers to a neighboring aggregate
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        anbrs = agg[nbrs]
        anbrs = anbrs[anbrs != -1]
        if anbrs.size:
            agg[i] = anbrs[0]
    # pass 3: isolated nodes become their own aggregate
    for i in range(n):
        if agg[i] == -1:
            agg[i] = na
            na += 1
    return agg


def _aggregate_boxes(coords: np.ndarray, h_box: float) -> np.ndarray:
    """Lattice-box aggregation: nodes sharing a quantized coordinate box
    form one aggregate; aggregate ids follow (z, y, x)-lex box order.

    TPU-first replacement for greedy strength-graph aggregation on
    (quasi-)structured meshes: regular box aggregates keep the smoothed
    prolongator's offset set small and the Galerkin coarse operators
    banded under the induced lex coarse numbering, so every AMG level
    stays in gather-free DIA storage (ops/dia.py).
    """
    key = np.floor((coords - coords.min(axis=0)) / max(h_box, 1e-300))
    key = key.astype(np.int64)[:, ::-1]  # (z, y, x): z primary, like dofs
    _, agg = np.unique(key, axis=0, return_inverse=True)
    return agg


def _node_spacing(coords: np.ndarray) -> float:
    """Typical nearest-neighbor spacing of lex-ordered lattice nodes."""
    if coords.shape[0] < 2:
        return 1.0
    d = np.linalg.norm(np.diff(coords, axis=0), axis=1)
    d = d[d > 0]
    return float(np.median(d)) if d.size else 1.0


def _tentative_prolongator(dof_agg: np.ndarray, B: np.ndarray):
    """Build T (n_dofs x n_coarse) with per-aggregate orthonormal columns.

    dof_agg: (n_dofs,) aggregate id per dof.  B: (n_dofs, k) near-nullspace.
    Returns (T csr, B_coarse (n_coarse, k), emb (n_coarse,) int64,
    node_of (n_coarse,) int64): emb maps each coarse column to a distinct
    fine dof of its aggregate — the column embedding that makes T (and the
    smoothed P) banded in DIA storage (ops/dia.py), since aggregate members
    are lattice-near under the lex node numbering; node_of maps each coarse
    dof to its aggregate (= coarse node) for the next level.

    Rank-revealing: the per-aggregate basis comes from a batched SVD and
    near-zero singular directions are dropped.  A BC-zeroed near-nullspace
    (rigid-body modes zeroed at Dirichlet dofs, models/poromechanics.py)
    otherwise produces zero prolongator columns for aggregates whose nodes
    are all constrained, making the Galerkin coarse operator singular —
    the round-1 footing crash.
    """
    n = dof_agg.size
    k = B.shape[1]
    na = int(dof_agg.max()) + 1
    order = np.argsort(dof_agg, kind="stable")
    sizes = np.bincount(dof_agg, minlength=na)  # dofs per aggregate
    maxs = int(sizes.max())
    # padded per-aggregate local blocks
    Bpad = np.zeros((na, maxs, k))
    pos = np.arange(n) - np.repeat(np.cumsum(sizes) - sizes, sizes)
    Bpad[dof_agg[order], pos, :] = B[order, :]
    # batched thin SVD: Bpad = U @ diag(S) @ Vh per aggregate
    U, S, Vh = np.linalg.svd(Bpad, full_matrices=False)  # (na,maxs,k),(na,k),(na,k,k)
    # deterministic signs: largest-|.| entry of each U column positive
    amax = np.argmax(np.abs(U), axis=1)  # (na, k)
    sgn = np.sign(np.take_along_axis(U, amax[:, None, :], axis=1))[:, 0, :]
    sgn[sgn == 0] = 1.0
    U = U * sgn[:, None, :]
    Vh = Vh * sgn[:, :, None]
    # rank detection: keep directions with non-negligible singular value
    smax = S[:, :1]
    keep = S > np.maximum(smax, 1e-30) * 1e-8  # (na, k) boolean
    ncols = keep.sum(axis=1)
    n_coarse = int(ncols.sum())
    # global coarse column index of kept (aggregate, direction) pairs
    col_of = np.full((na, k), -1, dtype=np.int64)
    col_of[keep] = np.arange(n_coarse)
    # scatter kept U columns into sparse T
    data = U[dof_agg[order], pos, :]  # (n, k)
    cols = col_of[dof_agg[order], :]  # (n, k)
    rows = np.repeat(order, k)
    sel = cols.ravel() >= 0
    T = sp.csr_matrix(
        (data.ravel()[sel], (rows[sel], cols.ravel()[sel])),
        shape=(n, max(n_coarse, 1)),
    )
    # coarse near-nullspace rows: Bc[col_of[a,i], :] = S[a,i] * Vh[a,i,:]
    Bc = np.zeros((max(n_coarse, 1), k))
    Bc[col_of[keep], :] = (S[:, :, None] * Vh)[keep]
    # column embedding: coarse column (a, i) -> the rank(i)-th member dof
    # of aggregate a (members are disjoint => injective; lattice-near =>
    # bounded DIA offsets for T and the smoothed P)
    starts = np.cumsum(sizes) - sizes
    aa, _ = np.nonzero(keep)
    ranks = (np.cumsum(keep, axis=1) - 1)[keep]
    emb = np.zeros(max(n_coarse, 1), dtype=np.int64)
    emb[col_of[keep]] = order[starts[aa] + ranks]
    node_of = np.zeros(max(n_coarse, 1), dtype=np.int64)
    node_of[col_of[keep]] = aa
    return T, Bc, emb, node_of


def _drop_weak_p_diagonals(P: sp.csr_matrix, emb: np.ndarray, tol: float):
    """DIA-aware interpolation truncation: drop whole weak BANDS of the
    smoothed prolongator.

    The device format is banded (DIA under the coarse-column embedding,
    ops/dia.py), so the P cost scales with its DIAGONAL count, not nnz —
    in 3D the degree-1-smoothed P carries ~950 stored diagonals of which
    most are smoothing fringe with tiny amplitude (PERF.md).  A band d is
    dropped when max|P| over the band < tol * max|P| globally.  Row-wise
    (hypre-style) truncation does NOT help here: every diagonal keeps
    some row where it is locally significant, so the band count survives.
    No rescaling: the kept bands carry the dominant interpolation weights
    and rescaling measurably degrades the V-cycle (tested)."""
    coo = P.tocoo()
    off = emb[coo.col].astype(np.int64) - coo.row
    uniq, inv = np.unique(off, return_inverse=True)
    dmax = np.zeros(uniq.size)
    np.maximum.at(dmax, inv, np.abs(coo.data))
    keep_diag = dmax >= tol * dmax.max()
    keep = keep_diag[inv]
    return sp.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=P.shape
    )


def _power_lmax(A: sp.csr_matrix, dinv: np.ndarray, iters=15, seed=0) -> float:
    rng = np.random.default_rng(seed)
    v = rng.normal(size=A.shape[0])
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = dinv * (A @ v)
        lam = np.linalg.norm(w)
        if lam == 0:
            return 1.0
        v = w / lam
    return float(lam)


@dataclass
class AMGLevelHost:
    A: sp.csr_matrix
    P: sp.csr_matrix
    R: sp.csr_matrix
    dinv: np.ndarray
    lmax: float


@jax.tree_util.register_pytree_node_class
@dataclass
class AMGLevel:
    A: ELL
    P: ELL  # prolongator; restriction applied as P^T via scatter-add
    dinv: jax.Array
    lmax: float  # static

    def tree_flatten(self):
        return (self.A, self.P, self.dinv), (self.lmax,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])


@jax.tree_util.register_pytree_node_class
class AMG:
    """Device-side V-cycle. Callable as a preconditioner: x = AMG(b).

    The coarsest level is applied as a dense matvec with the explicit
    inverse (computed in f64 on host): on TPU a triangular lu_solve is a
    sequential latency chain (~n/128 dependent steps), while ``Ainv @ b``
    is one MXU matmul — the classic substitution for device-side direct
    solves.
    """

    def __init__(
        self, levels, coarse_inv, presmooth=1, postsmooth=1, cheb_lower=4.0
    ):
        self.levels = tuple(levels)
        self.coarse_inv = coarse_inv
        self.presmooth = presmooth
        self.postsmooth = postsmooth
        self.cheb_lower = cheb_lower

    def tree_flatten(self):
        return (self.levels, self.coarse_inv), (
            self.presmooth,
            self.postsmooth,
            self.cheb_lower,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    # -- smoothing: Chebyshev over [lmax/cheb_lower, 1.1 lmax] of D^-1 A ---

    def _smooth(self, lvl: AMGLevel, b, x, iters, x_is_zero=False):
        lmin = lvl.lmax / self.cheb_lower
        lmax = 1.1 * lvl.lmax
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma1 = theta / delta
        # presmoothing starts from x=0: r = b exactly, skip the matvec
        r = b if x_is_zero else b - lvl.A.matvec(x)
        d = (lvl.dinv * r) / theta
        rho = 1.0 / sigma1
        for _ in range(iters):
            x = x + d
            r = r - lvl.A.matvec(d)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (lvl.dinv * r)
            rho = rho_new
        return x + d

    def _cycle(self, li, b):
        if li == len(self.levels):
            return self.coarse_inv @ b
        lvl = self.levels[li]
        x = self._smooth(lvl, b, jnp.zeros_like(b), self.presmooth, x_is_zero=True)
        r = b - lvl.A.matvec(x)
        bc = lvl.P.rmatvec(r)  # restriction = P^T r
        # coarse levels are row-padded to 128 on device (identity pad rows,
        # amg_setup) so their operators qualify for the Pallas DIA kernels;
        # the coarse vector is zero-padded on the way down and truncated on
        # the way up — pad dofs are decoupled, so they stay exactly zero
        nc = lvl.P.shape[1]
        nxt = (
            self.levels[li + 1].A.shape[0]
            if li + 1 < len(self.levels)
            else self.coarse_inv.shape[0]
        )
        if nxt > nc:
            bc = jnp.pad(bc, (0, nxt - nc))
        xc = self._cycle(li + 1, bc)
        x = x + lvl.P.matvec(xc[:nc])
        x = self._smooth(lvl, b, x, self.postsmooth)
        return x

    def __call__(self, b):
        return self._cycle(0, b)


def amg_setup(
    A: sp.csr_matrix,
    dofs_per_node: int = 1,
    B: np.ndarray | None = None,
    theta: float = 0.08,
    max_levels: int = 10,
    coarse_size: int = 2000,
    presmooth: int = 1,
    postsmooth: int = 1,
    coords: np.ndarray | None = None,
    h0: float | None = None,
    box_factor: float | None = None,
    smooth_degree: int = 1,
    cheb_lower: float = 4.0,
    p_drop_tol: float = 0.0,
    dtype=jnp.float32,
) -> AMG:
    """Build a smoothed-aggregation AMG hierarchy for SPD-ish A.

    ``coords`` (n_nodes, dim): when given, coarsening uses lattice-box
    aggregation (_aggregate_boxes) so every level and prolongator stays in
    banded DIA storage; otherwise greedy strength-graph aggregation.

    Restriction is applied matrix-free as P^T (scatter-add), halving the
    device footprint; the coarsest level is a dense LU solve.

    ``B``: near-nullspace (n, k); defaults to constants per component.
    ``dofs_per_node``: node-block size (geometric dim for vector fields).
    """
    A = A.tocsr()
    n = A.shape[0]
    d = dofs_per_node
    if B is None:
        k0 = d
        B = np.zeros((n, k0))
        for c in range(d):
            B[c::d, c] = 1.0

    levels = []
    max_dense = max(coarse_size * 4, 6000)
    # coords-driven lattice-box coarsening state (see _aggregate_boxes)
    use_boxes = coords is not None
    if use_boxes:
        coords = np.asarray(coords, dtype=np.float64)
        if box_factor is None:
            # dimension-aware default: 2x2 boxes give the measured h-robust
            # hierarchy in 2D (tools/amg_tune_solid.py), but in 3D the
            # smoothed prolongator of a 2-box aggregate spans 5^3 boxes and
            # the Galerkin coarse operator densifies (~1050 nnz/row on the
            # swelling-3d solid block); 3x3x3 boxes keep it one banded DIA
            # level + a small dense coarse solve
            box_factor = 2.0 if coords.shape[1] == 2 else 3.0
        node_of_dof = np.repeat(np.arange(coords.shape[0]), d)
        if node_of_dof.size != A.shape[0]:
            raise ValueError("coords size does not match A / dofs_per_node")
        h_node = _node_spacing(coords) if h0 is None else float(h0)

    while A.shape[0] > coarse_size and len(levels) < max_levels - 1:
        if use_boxes:
            agg = None
            # grow the box until it actually coarsens (pathological local
            # refinement can leave 1-node boxes at the base scale)
            for grow in range(4):
                cand = _aggregate_boxes(coords, box_factor * h_node * 2**grow)
                if int(cand.max()) + 1 <= 0.7 * coords.shape[0]:
                    agg = cand
                    h_node = box_factor * h_node * 2**grow
                    break
            if agg is None:
                break
            dof_agg = agg[node_of_dof]
        else:
            # rank-revealing column drops can leave a coarse dof count that
            # is not a multiple of the nominal block size; collapse per-dof
            if A.shape[0] % d != 0:
                d = 1
            C = _node_graph(A, d)
            S = _strength(C, theta)
            agg = _aggregate(S)
            na = int(agg.max()) + 1
            # coarsening stall guard: mass-dominated blocks (e.g. the fluid
            # Darcy-drag block) produce near-empty strength graphs whose
            # singleton aggregates would generate a chain of near-dense
            # coarse operators; stop and solve this level directly instead
            if na * B.shape[1] >= A.shape[0] or na > 0.7 * C.shape[0]:
                if A.shape[0] > max_dense:
                    # one retry with a looser strength threshold
                    S = _strength(C, theta / 4.0)
                    agg = _aggregate(S)
                    na = int(agg.max()) + 1
                    if na * B.shape[1] >= A.shape[0] or na > 0.7 * C.shape[0]:
                        break
                else:
                    break
            dof_agg = np.repeat(agg, d)
        T, Bc, emb, node_of_coarse = _tentative_prolongator(dof_agg, B)
        if T.shape[1] >= A.shape[0]:
            break
        diag = np.asarray(A.diagonal())
        diag[diag == 0] = 1.0
        dinv = 1.0 / diag
        lmax = _power_lmax(A, dinv)
        # P = (I - 4/(3 lmax) D^-1 A)^q T  (q = smooth_degree; q=2 widens
        # the interpolation stencil — better for stiff vector blocks)
        Dinv = sp.diags(dinv)
        P = T
        for _ in range(max(smooth_degree, 0)):
            P = (P - (4.0 / (3.0 * lmax)) * (Dinv @ (A @ P))).tocsr()
        if p_drop_tol > 0.0:
            P = _drop_weak_p_diagonals(P, emb, p_drop_tol)
        Ac = (P.T.tocsr() @ (A @ P)).tocsr()
        # Device-side row padding to 128 for coarse levels (li >= 1): unit
        # diagonal on the pad rows of A, zero pad rows on P, dinv = 1 — the
        # pads are fully decoupled (zero in -> zero out, bit-identical real
        # dofs) and make the level operators eligible for the Pallas DIA
        # kernels (ops/pallas_dia.py requires nrows % 128 == 0).  Level 0
        # arrives padded by the model's "pad multiple" layout; the host
        # hierarchy (A, Ac, B, coords) stays unpadded.
        rowpad = (-A.shape[0]) % 128 if levels else 0
        A_dev = sp.block_diag(
            [A, sp.identity(rowpad, format="csr")], format="csr"
        ) if rowpad else A
        P_dev = sp.vstack(
            [P, sp.csr_matrix((rowpad, P.shape[1]))], format="csr"
        ) if rowpad else P
        dinv_dev = np.concatenate([dinv, np.ones(rowpad)]) if rowpad else dinv
        levels.append(
            AMGLevel(
                device_matrix(A_dev, dtype),
                # restriction (P^T r) is as hot as prolongation: store the
                # transposed layout so both ride the Pallas forward kernel
                device_matrix(P_dev, dtype, col_emb=emb, need_rmatvec=True),
                jnp.asarray(dinv_dev, dtype=dtype),
                lmax,
            )
        )
        A = Ac
        B = Bc
        d = B.shape[1]
        if use_boxes:
            # coarse node coords = aggregate centroids; next boxes 1 scale up
            na = int(agg.max()) + 1
            cnt = np.bincount(agg, minlength=na).astype(np.float64)
            cen = np.stack(
                [np.bincount(agg, weights=coords[:, j], minlength=na) for j in range(coords.shape[1])],
                axis=1,
            ) / cnt[:, None]
            coords = cen
            node_of_dof = node_of_coarse

    # coarsest: dense inverse (host f64 factorization, device matvec).
    # Singularity-proof: an exactly/nearly singular Galerkin coarse matrix
    # (e.g. semidefinite blocks, or fully-constrained aggregates that slip
    # past the rank filter) falls back to the pseudo-inverse — for a
    # preconditioner the least-squares solve on the singular subspace is
    # exactly what we want.
    Ad = np.asarray(A.todense(), dtype=np.float64)
    try:
        Ainv = sla.inv(Ad)
        if not np.all(np.isfinite(Ainv)):
            raise np.linalg.LinAlgError("non-finite inverse")
        # guard against numerically-meaningless inverses of near-singular Ad
        scale = np.abs(Ad).max() or 1.0
        if np.abs(Ainv).max() * scale > 1e14:
            raise np.linalg.LinAlgError("ill-conditioned coarse matrix")
    except np.linalg.LinAlgError:
        Ainv = np.linalg.pinv(Ad, rcond=1e-12)
    return AMG(
        levels,
        jnp.asarray(Ainv, dtype=dtype),
        presmooth,
        postsmooth,
        cheb_lower,
    )


def rigid_body_modes(coords: np.ndarray) -> np.ndarray:
    """Near-nullspace for elasticity: translations + rotations.

    coords: (n_nodes, dim) node coordinates.  Returns (n_nodes*dim, k) with
    k=3 (2D) or 6 (3D).  (The reference sketches the same basis for GAMG in
    solid.py:132-168, commented out.)
    """
    nn, dim = coords.shape
    if dim == 2:
        k = 3
        B = np.zeros((nn * 2, k))
        B[0::2, 0] = 1.0
        B[1::2, 1] = 1.0
        B[0::2, 2] = -coords[:, 1]
        B[1::2, 2] = coords[:, 0]
    else:
        k = 6
        B = np.zeros((nn * 3, k))
        for c in range(3):
            B[c::3, c] = 1.0
        # rotations: (0,-z,y), (z,0,-x), (-y,x,0)
        B[1::3, 3] = -coords[:, 2]
        B[2::3, 3] = coords[:, 1]
        B[0::3, 4] = coords[:, 2]
        B[2::3, 4] = -coords[:, 0]
        B[0::3, 5] = -coords[:, 1]
        B[1::3, 5] = coords[:, 0]
    return B
