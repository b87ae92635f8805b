"""SpMV kernels (jnp reference implementation).

The reference's SpMV is PETSc MatMult (C, CSR + MPI halo) called once per
Krylov iteration (lib/AAR.py:135, inside every KSPSolve).  On TPU, CSR's
per-row variable lengths defeat the vector units, so we use ELL padded
rows: ``y[i] = sum_l data[i, l] * x[cols[i, l]]`` — a dense gather plus a
lane reduction that XLA maps onto the VPU with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def ell_matvec(data: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x for ELL storage. data/cols: (n, L); x: (m,)."""
    return jnp.sum(data * x[cols], axis=1)


@jax.jit
def ell_matmat(data: jax.Array, cols: jax.Array, X: jax.Array) -> jax.Array:
    """Y = A @ X for multiple right-hand sides, X: (m, k) -> (n, k).

    Used by blocked solvers and Anderson history updates.
    """
    return jnp.einsum("nl,nlk->nk", data, X[cols])


from functools import partial


@partial(jax.jit, static_argnames=("ncols",))
def ell_rmatvec(data: jax.Array, cols: jax.Array, x: jax.Array, ncols: int):
    """y = A^T @ x via scatter-add on the ELL arrays of A.

    Lets transposed operators (AMG restriction R = P^T) reuse the
    prolongator's storage instead of a second padded ELL whose max-row
    padding blows up on long coarse rows.
    """
    contrib = data * x[:, None]
    return jnp.zeros(ncols, dtype=data.dtype).at[cols.ravel()].add(
        contrib.ravel()
    )
