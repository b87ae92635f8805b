"""Tests: smoothed-aggregation AMG, inner solvers, Schur fieldsplit."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from porotpu.fem import assemble
from porotpu.fem.bcs import apply_bcs_matrix
from porotpu.fem.dofmap import FunctionSpace
from porotpu.fem.mesh import generate_square
from porotpu.ops.sparse import ELL
from porotpu.precond.amg import amg_setup, rigid_body_modes
from porotpu.precond.inner import InnerConfig, build_inner_solver
from porotpu.precond.schur import build_schur_fieldsplit, selfp_schur
from porotpu.solvers import cg


def _poisson(N, degree=1):
    mesh, markers, *_ = generate_square(N, 1.0)
    V = FunctionSpace(mesh, degree)
    K = assemble.stiffness(V).tocsr()
    bdofs = V.boundary_nodes()
    K = apply_bcs_matrix(K, bdofs)
    return K, V


def test_amg_poisson_h_robust():
    iters = {}
    for N in (8, 16, 32):
        K, V = _poisson(N, degree=1)
        amg = amg_setup(K, dtype=jnp.float64)
        b = np.random.default_rng(0).normal(size=K.shape[0])
        E = ELL.from_csr(K, jnp.float64)
        res = cg(E.matvec, jnp.asarray(b), M=amg, rtol=1e-8, maxiter=100)
        assert bool(res.converged), f"N={N} not converged"
        iters[N] = int(res.iters)
    # h-robustness: iteration growth should be mild
    assert iters[32] <= iters[8] + 10, iters
    assert iters[32] < 30, iters


def test_amg_p2_poisson():
    K, V = _poisson(16, degree=2)
    amg = amg_setup(K, dtype=jnp.float64)
    b = np.random.default_rng(1).normal(size=K.shape[0])
    E = ELL.from_csr(K, jnp.float64)
    res = cg(E.matvec, jnp.asarray(b), M=amg, rtol=1e-8, maxiter=100)
    assert bool(res.converged)
    assert int(res.iters) < 40


def test_amg_elasticity_rigid_modes():
    mesh, markers, LEFT, RIGHT, TOP, BOTTOM, NONE = generate_square(12, 1.0)
    V = FunctionSpace(mesh, 2, vector=True)
    K = assemble.hooke(V, mu=1.0, lam=1.0) + assemble.mass(V, 1e-3)
    K = K.tocsr()
    B = rigid_body_modes(V.node_coords)
    amg = amg_setup(K, dofs_per_node=2, B=B, dtype=jnp.float64)
    b = np.random.default_rng(2).normal(size=K.shape[0])
    E = ELL.from_csr(K, jnp.float64)
    res = cg(E.matvec, jnp.asarray(b), M=amg, rtol=1e-8, maxiter=200)
    assert bool(res.converged)
    assert int(res.iters) < 60


@pytest.mark.parametrize(
    "method", ["jacobi", "chebyshev", "cg", "lu", "amg", "cg+amg"]
)
def test_inner_solver_reduces_error(method):
    K, V = _poisson(8)
    cfg = InnerConfig(method=method, iters=10)
    solver = build_inner_solver(K, cfg, dtype=jnp.float64)
    xref = np.random.default_rng(3).normal(size=K.shape[0])
    b = K @ xref
    x = np.asarray(solver(jnp.asarray(b)))
    err0 = np.linalg.norm(xref)
    err = np.linalg.norm(x - xref)
    if method == "lu":
        assert err < 1e-8 * err0
    elif method == "jacobi":
        assert err < err0  # single sweep just must not amplify
    else:
        assert err < 0.5 * err0


def test_schur_fieldsplit_solves_stokes_like():
    # small saddle-ish system: [[A, B^T], [B, -C]]
    rng = np.random.default_rng(4)
    nf, npp = 80, 30
    Q = sp.random(nf, nf, 0.1, random_state=rng)
    Aff = (Q @ Q.T + nf * sp.eye(nf)).tocsr()
    Afp = sp.random(nf, npp, 0.2, random_state=rng).tocsr()
    Apf = Afp.T.tocsr()
    App = (sp.eye(npp) * 2.0).tocsr()
    Afull = sp.bmat([[Aff, Afp], [Apf, App]]).tocsr()

    fs = build_schur_fieldsplit(
        Aff,
        Afp,
        Apf,
        App,
        InnerConfig(method="lu"),
        InnerConfig(method="lu"),
        dtype=jnp.float64,
    )
    b = rng.normal(size=nf + npp)
    E = ELL.from_csr(Afull, jnp.float64)
    from porotpu.solvers import fgmres

    res = fgmres(E.matvec, jnp.asarray(b), M=fs, rtol=1e-10, maxiter=60)
    assert bool(res.converged)
    xref = spla.spsolve(Afull.tocsc(), b)
    assert np.allclose(np.asarray(res.x), xref, atol=1e-6)
    # with exact inner solves and exact selfp (diagonal-dominant Aff) the
    # preconditioner is strong: few iterations
    assert int(res.iters) < 25


def test_prolongator_band_truncation():
    """Band-wise interpolation truncation (precond/amg.py:
    _drop_weak_p_diagonals): weak bands vanish, strong bands survive
    untouched, and the V-cycle still contracts."""
    import numpy as np
    import scipy.sparse as sp

    from porotpu.precond.amg import _drop_weak_p_diagonals

    rng = np.random.default_rng(0)
    n, nc = 200, 50
    emb = np.arange(0, n, 4)[:nc]
    ii = np.arange(n)
    jj = np.clip(ii // 4, 0, nc - 1)
    P = sp.csr_matrix((np.ones(n), (ii, jj)), shape=(n, nc))
    # add a weak fringe band (1e-3) and a strong secondary band (0.5)
    P = P + sp.csr_matrix(
        (np.full(n - 8, 0.5), (ii[:-8], np.clip(jj[:-8] + 1, 0, nc - 1))),
        shape=(n, nc),
    )
    P = P + sp.csr_matrix(
        (np.full(n - 16, 1e-3), (ii[:-16], np.clip(jj[:-16] + 2, 0, nc - 1))),
        shape=(n, nc),
    )
    def bands(M):
        coo = M.tocoo()
        return np.unique(emb[coo.col].astype(np.int64) - coo.row)

    nb0 = bands(P).size
    Pt = _drop_weak_p_diagonals(P, emb, 0.05)
    assert bands(Pt).size < nb0
    # strong entries unchanged (no rescaling)
    d0 = P.tocoo()
    keep = np.abs(d0.data) >= 0.4
    Ptd = Pt.todok()
    for r, c, v in zip(d0.row[keep], d0.col[keep], d0.data[keep]):
        assert abs(Ptd[r, c] - v) < 1e-14
    # and the weak band is gone
    assert np.abs(Pt.data).min() >= 0.4
