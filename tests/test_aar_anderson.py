"""Tests for AAR solver and Anderson acceleration."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from porotpu.ops.sparse import ELL
from porotpu.solvers import AndersonAccelerator, aar


def _spd(n, seed=0, density=0.05):
    rng = np.random.default_rng(seed)
    Q = sp.random(n, n, density, random_state=rng)
    return (Q @ Q.T + n * sp.eye(n)).tocsr()


def test_aar_solves_jacobi_preconditioned():
    A = _spd(120, seed=1)
    b = np.random.default_rng(2).normal(size=120)
    E = ELL.from_csr(A, jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res = aar(
        E.matvec,
        jnp.asarray(b),
        M=lambda r: dinv * r,
        order=10,
        p=5,
        omega=0.5,
        beta=1.0,
        rtol=1e-10,
        atol=1e-12,
        maxiter=2000,
    )
    assert bool(res.converged)
    xref = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(np.asarray(res.x) - xref) / np.linalg.norm(xref) < 1e-6


def test_aar_anderson_beats_plain_richardson():
    A = _spd(100, seed=3)
    b = np.random.default_rng(4).normal(size=100)
    E = ELL.from_csr(A, jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    M = lambda r: dinv * r
    common = dict(M=M, omega=0.5, beta=1.0, rtol=1e-8, atol=0.0, maxiter=3000)
    res_plain = aar(E.matvec, jnp.asarray(b), order=0, p=5, **common)
    res_aar = aar(E.matvec, jnp.asarray(b), order=10, p=5, **common)
    assert bool(res_aar.converged)
    assert int(res_aar.iters) < int(res_plain.iters)


def test_anderson_accelerates_linear_fixed_point():
    # fixed point x = Gx + c, symmetric G, spectral radius 0.95: plain
    # iteration converges like 0.95^k; Anderson behaves like restarted
    # GMRES on I-G and is far faster.
    rng = np.random.default_rng(5)
    n = 50
    G = rng.normal(size=(n, n))
    G = 0.5 * (G + G.T)
    G = 0.95 * G / np.max(np.abs(np.linalg.eigvals(G)))
    c = rng.normal(size=n)
    xstar = np.linalg.solve(np.eye(n) - G, c)

    Gj = jnp.asarray(G)
    cj = jnp.asarray(c)

    def g(x):
        return Gj @ x + cj

    # plain iteration
    x = jnp.zeros(n, dtype=jnp.float64)
    for _ in range(30):
        x = g(x)
    err_plain = np.linalg.norm(np.asarray(x) - xstar)

    acc = AndersonAccelerator(order=8)
    st = acc.init(n, dtype=jnp.float64)
    x = jnp.zeros(n, dtype=jnp.float64)
    for _ in range(30):
        st, x = acc.step(st, g(x))
    err_acc = np.linalg.norm(np.asarray(x) - xstar)
    assert err_acc < 0.1 * err_plain


def test_anderson_order0_passthrough():
    acc = AndersonAccelerator(order=0)
    st = acc.init(4, dtype=jnp.float64)
    g = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    st, x = acc.step(st, g)
    assert np.allclose(np.asarray(x), np.asarray(g))


def test_aar_pc_accel_order():
    # reference "inner accel order" (lib/Preconditioner.py:248-249) on the
    # AAR path: accelerated-PC run must still converge to the solution
    A = _spd(80, seed=6)
    b = np.random.default_rng(7).normal(size=80)
    E = ELL.from_csr(A, jnp.float64)
    dinv = jnp.asarray(1.0 / A.diagonal())
    res = aar(
        E.matvec,
        jnp.asarray(b),
        M=lambda r: dinv * r,
        order=8,
        p=4,
        omega=0.5,
        rtol=1e-9,
        atol=0.0,
        maxiter=2000,
        pc_accel_order=1,
    )
    assert bool(res.converged)
    xref = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(np.asarray(res.x) - xref) / np.linalg.norm(xref) < 1e-6


def test_aar_step_type_monitor(capfd):
    """AAR prints the per-iteration [R]/[A] step type under monitoring
    (reference lib/AAR.py:121-123)."""
    import numpy as np

    import jax.numpy as jnp

    from porotpu.solvers.aar import aar

    rng = np.random.default_rng(0)
    n = 40
    Q = rng.normal(size=(n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.normal(size=n)
    Ad = jnp.asarray(A)
    res = aar(
        lambda x: Ad @ x, jnp.asarray(b),
        M=lambda r: r / jnp.diag(Ad),
        order=5, p=3, rtol=1e-10, atol=1e-12, maxiter=200, monitor=True,
    )
    assert bool(res.converged)
    out = capfd.readouterr().out + capfd.readouterr().err
    assert "[R]" in out and "[A]" in out
