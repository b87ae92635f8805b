"""Tests: ELL SpMV vs scipy, Krylov solvers vs scipy direct solves."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from porotpu.ops.sparse import ELL, FieldMatrix
from porotpu.solvers import cg, chebyshev, estimate_spectrum, fgmres, gmres, richardson
from porotpu.solvers.cg import cg_fixed
from porotpu.solvers.convergence import FieldwiseTest


def _random_csr(n, density=0.05, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csr")
    if spd:
        A = A @ A.T + n * sp.eye(n)
    else:
        A = A + n * sp.eye(n)
    return A.tocsr()


def test_ell_matvec_matches_scipy():
    A = _random_csr(200, 0.03, seed=1)
    x = np.random.default_rng(2).normal(size=200)
    E = ELL.from_csr(A, dtype=jnp.float64)
    y = np.asarray(E.matvec(jnp.asarray(x)))
    assert np.allclose(y, A @ x, atol=1e-12)


def test_ell_empty_rows():
    A = sp.csr_matrix((np.array([1.0]), (np.array([2]), np.array([3]))), shape=(5, 5))
    E = ELL.from_csr(A, dtype=jnp.float64)
    x = np.arange(5.0)
    assert np.allclose(np.asarray(E.matvec(jnp.asarray(x))), A @ x)


def test_field_matrix_matvec():
    ns, nf = 40, 30
    Ass = _random_csr(ns, 0.1, seed=3)
    Aff = _random_csr(nf, 0.1, seed=4)
    Asf = sp.random(ns, nf, 0.1, random_state=np.random.default_rng(5)).tocsr()
    FM = FieldMatrix.from_csr_blocks(
        {("s", "s"): Ass, ("f", "f"): Aff, ("s", "f"): Asf},
        {"s": ns, "f": nf},
        dtype=jnp.float64,
    )
    x = np.random.default_rng(6).normal(size=ns + nf)
    y = np.asarray(FM.matvec(jnp.asarray(x)))
    yref = np.concatenate([Ass @ x[:ns] + Asf @ x[ns:], Aff @ x[ns:]])
    assert np.allclose(y, yref, atol=1e-12)


def test_cg_spd():
    A = _random_csr(150, 0.05, seed=7, spd=True)
    b = np.random.default_rng(8).normal(size=150)
    E = ELL.from_csr(A, dtype=jnp.float64)
    res = cg(E.matvec, jnp.asarray(b), rtol=1e-10, maxiter=300)
    xref = spla.spsolve(A.tocsc(), b)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), xref, atol=1e-6)


def test_cg_jacobi_preconditioned_converges_faster():
    A = _random_csr(150, 0.05, seed=9, spd=True)
    # make it badly scaled
    d = np.logspace(0, 3, 150)
    A = sp.diags(d) @ A @ sp.diags(d)
    b = np.random.default_rng(10).normal(size=150)
    E = ELL.from_csr(A, dtype=jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res_plain = cg(E.matvec, jnp.asarray(b), rtol=1e-8, maxiter=500)
    res_pc = cg(E.matvec, jnp.asarray(b), M=lambda r: dinv * r, rtol=1e-8, maxiter=500)
    assert int(res_pc.iters) < int(res_plain.iters)
    assert bool(res_pc.converged)


@pytest.mark.parametrize("solver", [gmres, fgmres])
def test_gmres_nonsymmetric(solver):
    A = _random_csr(120, 0.05, seed=11)
    b = np.random.default_rng(12).normal(size=120)
    E = ELL.from_csr(A, dtype=jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res = solver(
        E.matvec, jnp.asarray(b), M=lambda r: dinv * r, rtol=1e-10, maxiter=200
    )
    xref = spla.spsolve(A.tocsc(), b)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), xref, atol=1e-5)


def test_gmres_restarted():
    A = _random_csr(120, 0.05, seed=13)
    b = np.random.default_rng(14).normal(size=120)
    E = ELL.from_csr(A, dtype=jnp.float64)
    res = fgmres(E.matvec, jnp.asarray(b), restart=30, rtol=1e-8, maxiter=400)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) < 1e-6 * np.linalg.norm(b)


def test_gmres_fieldwise_test():
    ns, nf2 = 60, 60
    A = _random_csr(120, 0.05, seed=15)
    b = np.random.default_rng(16).normal(size=120)
    E = ELL.from_csr(A, dtype=jnp.float64)
    fw = FieldwiseTest.from_sizes((ns, nf2), jnp.asarray(b))
    res = fgmres(
        E.matvec, jnp.asarray(b), rtol=1e-9, atol=0.0, maxiter=200, fieldwise=fw
    )
    assert bool(res.converged)
    r = b - A @ np.asarray(res.x)
    err_rel = np.max(np.abs(r)) / max(
        np.linalg.norm(b[:ns]), np.linalg.norm(b[ns:])
    )
    assert err_rel < 1e-8


def test_chebyshev_and_estimate():
    A = _random_csr(100, 0.05, seed=17, spd=True)
    E = ELL.from_csr(A, dtype=jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    M = lambda r: dinv * r
    lmax = estimate_spectrum(E.matvec, 100, iters=30, M=M, dtype=jnp.float64)
    b = np.random.default_rng(18).normal(size=100)
    x = chebyshev(E.matvec, jnp.asarray(b), lmax / 30.0, 1.1 * lmax, iters=30, M=M)
    xref = spla.spsolve(A.tocsc(), b)
    rel = np.linalg.norm(np.asarray(x) - xref) / np.linalg.norm(xref)
    assert rel < 0.1  # 30 chebyshev iters should reduce error a lot


def test_cg_fixed_and_richardson():
    A = _random_csr(80, 0.08, seed=19, spd=True)
    E = ELL.from_csr(A, dtype=jnp.float64)
    b = np.random.default_rng(20).normal(size=80)
    xref = spla.spsolve(A.tocsc(), b)
    x = cg_fixed(E.matvec, jnp.asarray(b), iters=60)
    assert np.linalg.norm(np.asarray(x) - xref) / np.linalg.norm(xref) < 1e-6
    dinv = jnp.asarray(1.0 / A.diagonal())
    x2 = richardson(E.matvec, jnp.asarray(b), M=lambda r: dinv * r, omega=1.0, iters=200)
    assert np.linalg.norm(np.asarray(x2) - xref) / np.linalg.norm(xref) < 1e-2


def test_divergence_detection():
    """A sign-indefinite system makes the (unpreconditioned-norm) residual
    blow up; the solvers must exit early with diverged=True rather than
    burning maxiter iterations (reference lib/Solver.py:46-48, divtol)."""
    n = 60
    rng = np.random.default_rng(5)
    # symmetric indefinite: CG's residual excursion passes 4.6e2 before any
    # eventual recovery — with divtol below that peak the guard must fire
    B = sp.random(n, n, density=0.1, random_state=rng).toarray()
    A = sp.csr_matrix(B + B.T + 0.1 * np.eye(n))
    E = ELL.from_csr(A, dtype=jnp.float64)
    b = jnp.asarray(rng.normal(size=n))

    res = cg(E.matvec, b, rtol=1e-12, maxiter=300, divtol=1e2)
    assert bool(res.diverged) and not bool(res.converged)
    assert int(res.iters) < 108  # unguarded run needs 108 its to recover

    from porotpu.solvers import aar

    # wrong-sign amplifying PC: Richardson iteration matrix has spectral
    # radius ~11 on diag(+-1) => geometric residual blow-up
    d = np.concatenate([np.full(n // 2, 1.0), np.full(n - n // 2, -1.0)])
    Ad = ELL.from_csr(sp.diags(d).tocsr(), dtype=jnp.float64)
    M = lambda r: -5.0 * r
    res = aar(Ad.matvec, b, M=M, omega=2.0, order=0, rtol=1e-12,
              maxiter=500, divtol=1e6)
    assert bool(res.diverged) and not bool(res.converged)
    assert int(res.iters) < 500


def test_fgmres_never_diverges_on_sane_system():
    A = _random_csr(80, 0.05, seed=23)
    b = np.random.default_rng(24).normal(size=80)
    E = ELL.from_csr(A, dtype=jnp.float64)
    res = fgmres(E.matvec, jnp.asarray(b), rtol=1e-10, maxiter=200)
    assert bool(res.converged) and not bool(res.diverged)


def test_gmres_pc_accel_order():
    """Anderson acceleration of the PC output (the reference's "inner
    accel order", lib/Preconditioner.py:248-249) — documented semantics.

    The mixed PC output is the new direction plus a combination of
    already-stored history directions, so the Arnoldi minimization span —
    hence the residual trace — is provably unchanged for ANY outer GMRES.
    What differs is the solution reconstruction:
    - flexible (ours, default): dx = y @ Z uses the actual mixed
      directions => solution stays exact;
    - non-flexible (the reference's ``-global_ksp_type gmres``):
      x = x0 + M(V y) re-applies the stateful PC, which no longer matches
      the directions that built H => the returned solution is corrupted.
      This reproduces the reference's own caveat (">1 diverges always",
      swelling.py:75) as an observable, pinned-down behavior.
    """
    A = _random_csr(120, 0.05, seed=25)
    b = np.random.default_rng(26).normal(size=120)
    E = ELL.from_csr(A, dtype=jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    M = lambda r: dinv * r
    xref = spla.spsolve(A.tocsc(), b)

    fb = fgmres(E.matvec, jnp.asarray(b), M=M, rtol=1e-10, maxiter=200)
    fa = fgmres(E.matvec, jnp.asarray(b), M=M, rtol=1e-10, maxiter=200,
                pc_accel_order=2)
    # flexible + accel: exact solution, span-invariant trace
    assert bool(fa.converged)
    assert np.allclose(np.asarray(fa.x), xref, atol=1e-5)
    hb, ha = np.asarray(fb.history), np.asarray(fa.history)
    hb, ha = hb[~np.isnan(hb)], ha[~np.isnan(ha)]
    assert len(hb) == len(ha) and np.allclose(hb, ha, rtol=1e-3)

    # non-flexible + accel: same trace, corrupted reconstruction —
    # the reference's latent quirk, reproduced bit-for-bit
    acc = gmres(E.matvec, jnp.asarray(b), M=M, rtol=1e-10, maxiter=200,
                pc_accel_order=2)
    rel = np.linalg.norm(np.asarray(acc.x) - xref) / np.linalg.norm(xref)
    assert rel > 1e-3  # provably-wrong reconstruction is detectable
