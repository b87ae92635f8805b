"""Schur-complement fieldsplit solver for the fluid-pressure block.

Replaces PETSc PCFIELDSPLIT configured as
``-fp_pc_fieldsplit_type schur -fp_pc_fieldsplit_schur_fact_type lower
-fp_pc_fieldsplit_schur_precondition selfp`` (petsc-options-inexact:78-80;
reference setup_fieldsplit lib/Preconditioner.py:102-118).

"selfp" assembles the approximate Schur complement explicitly:
S = App - Apf diag(Aff)^-1 Afp  (host, setup time), then the lower
block-triangular factorization is applied:
    yf = Aff^-1 xf
    yp = S^-1 (xp - Apf yf)
with Aff^-1 and S^-1 provided by inner solvers (CG+AMG / dense LU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.dia import device_matrix
from ..ops.sparse import ELL
from .inner import InnerConfig, InnerSolver, build_inner_solver


def selfp_schur(
    Aff: sp.csr_matrix, Afp: sp.csr_matrix, Apf: sp.csr_matrix, App: sp.csr_matrix
) -> sp.csr_matrix:
    """S = App - Apf diag(Aff)^-1 Afp (PETSc 'selfp' preconditioner)."""
    d = np.asarray(Aff.diagonal()).ravel()
    d[d == 0] = 1.0
    return (App - Apf @ sp.diags(1.0 / d) @ Afp).tocsr()


@jax.tree_util.register_pytree_node_class
class SchurFieldsplit:
    """Lower Schur fieldsplit apply on the concatenated [f | p] vector."""

    def __init__(self, nf, solve_f: InnerSolver, solve_S: InnerSolver, Apf: ELL):
        self.nf = nf
        self.solve_f = solve_f
        self.solve_S = solve_S
        self.Apf = Apf

    def tree_flatten(self):
        return (self.solve_f, self.solve_S, self.Apf), (self.nf,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], children[1], children[2])

    def __call__(self, x_fp):
        xf = x_fp[: self.nf]
        xp = x_fp[self.nf :]
        yf = self.solve_f(xf)
        yp = self.solve_S(xp - self.Apf.matvec(yf))
        return jnp.concatenate([yf, yp])


def build_schur_fieldsplit(
    Aff: sp.csr_matrix,
    Afp: sp.csr_matrix,
    Apf: sp.csr_matrix,
    App: sp.csr_matrix,
    cfg_f: InnerConfig,
    cfg_S: InnerConfig,
    dofs_per_node_f: int = 1,
    near_nullspace_f=None,
    coords_f=None,
    coords_p=None,
    row_emb_pf=None,
    dtype=jnp.float32,
) -> SchurFieldsplit:
    S = selfp_schur(Aff, Afp, Apf, App)
    solve_f = build_inner_solver(
        Aff,
        cfg_f,
        dofs_per_node=dofs_per_node_f,
        near_nullspace=near_nullspace_f,
        coords=coords_f,
        dtype=dtype,
    )
    solve_S = build_inner_solver(S, cfg_S, coords=coords_p, dtype=dtype)
    # Apf (pressure rows x fluid cols) is tall-skinny transposed: store its
    # banded transpose under the P1->P2 row embedding (ops/dia.py)
    return SchurFieldsplit(
        Aff.shape[0],
        solve_f,
        solve_S,
        device_matrix(Apf, dtype, row_emb=row_emb_pf),
    )
