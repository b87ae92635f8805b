"""Chebyshev semi-iteration and spectrum estimation.

The TPU-native stand-in for hypre BoomerAMG smoothing / inner AMG solves
(SURVEY.md §2.3: option (a)).  A fixed-iteration polynomial in A is ideal
under jit: no data-dependent control flow, pure SpMV + axpy chains.
Eigenvalue bounds come from a short power iteration at setup, like PETSc's
``ksp_chebyshev_esteig``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_spectrum(A, n, iters=20, M=None, key=None, dtype=jnp.float32):
    """Estimate lambda_max of (M^-1 A) by power iteration (host-called, setup).

    Returns a float.  For SPD A and Jacobi M this bounds the Chebyshev
    interval; we use [lmax/30, 1.1*lmax] by default as in standard
    smoothed-aggregation practice.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if M is None:
        M = lambda r: r
    v = jax.random.normal(key, (n,), dtype=dtype)
    v = v / jnp.linalg.norm(v)

    def body(v, _):
        w = M(A(v))
        nw = jnp.linalg.norm(w)
        return w / jnp.where(nw > 0, nw, 1.0), nw

    v, norms = jax.lax.scan(body, v, None, length=iters)
    return float(norms[-1])


def chebyshev(A, b, lmin, lmax, iters=10, M=None, x0=None):
    """Chebyshev iteration targeting eigenvalues of M^-1 A in [lmin, lmax].

    Standard three-term recurrence (Saad, 'Iterative Methods', alg 12.1).
    """
    if M is None:
        M = lambda r: r
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros(n, dtype=b.dtype)

    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r = b - A(x0)
    z = M(r)
    d = z / theta
    x = x0
    rho = 1.0 / sigma1

    def body(c, _):
        x, d, r, rho = c
        x = x + d
        r = r - A(d)
        z = M(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        return (x, d, r, rho_new), None

    (x, d, r, rho), _ = jax.lax.scan(body, (x, d, r, rho), None, length=iters)
    return x + d
