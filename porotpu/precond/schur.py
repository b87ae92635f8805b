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


def mass_drag_schur(
    Afp: sp.csr_matrix,
    Apf: sp.csr_matrix,
    App: sp.csr_matrix,
    mass_drag_diag: np.ndarray,
) -> sp.csr_matrix:
    """S_md = App - Apf diag(gamma M_f)^-1 Afp: the reaction half of the
    discrete Cahouet-Chabard Schur preconditioner.

    ``mass_drag_diag`` is the diagonal of ONLY the mass + Darcy-drag part
    of the fluid operator, gamma = rhof/dt phi0 + (1+betaf) phi0^2/kf.
    Unlike selfp's diag(Aff), it excludes the viscous diagonal — which
    grows like mu_f/h^2 relative to gamma under refinement and wrecks the
    Laplacian scaling of the product term (measured: swelling 2-way outer
    iterations 10->47 over N=10..80 with selfp vs 10->17 with this +
    the viscous mass term; tools/schur_experiment.py).  The viscous limit
    is covered by the additive lumped-mass term w_visc = 2 mu_f / phi0
    (the Cahouet-Chabard pair, reference lib/Assembler.py:131-138 — the
    2-way analogue of the paper's 3-way beta_CC1/beta_CC2 construction).
    """
    d = np.asarray(mass_drag_diag, dtype=np.float64).copy()
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
    schur_kind: str = "selfp",
    mass_drag_diag: np.ndarray | None = None,
    visc_diag: np.ndarray | None = None,
    dtype=jnp.float32,
) -> SchurFieldsplit:
    """``schur_kind``: 'selfp' (PETSc parity, petsc-options-inexact:78-80)
    or 'dcc' (discrete Cahouet-Chabard, see mass_drag_schur) — 'dcc' needs
    ``mass_drag_diag`` (len nf) and ``visc_diag`` (len np, the additive
    viscous term w_visc/lumped(Mp), zero at Dirichlet pressure rows)."""
    solve_f = build_inner_solver(
        Aff,
        cfg_f,
        dofs_per_node=dofs_per_node_f,
        near_nullspace=near_nullspace_f,
        coords=coords_f,
        dtype=dtype,
    )
    if schur_kind == "dcc":
        S = mass_drag_schur(Afp, Apf, App, mass_drag_diag)
        base = build_inner_solver(S, cfg_S, coords=coords_p, dtype=dtype)
        solve_S = InnerSolver(
            "plus-diag",
            {"base": base, "wdiag": jnp.asarray(visc_diag, dtype=dtype)},
        )
    else:
        S = selfp_schur(Aff, Afp, Apf, App)
        solve_S = build_inner_solver(S, cfg_S, coords=coords_p, dtype=dtype)
    # Apf (pressure rows x fluid cols) is tall-skinny transposed: store its
    # banded transpose under the P1->P2 row embedding (ops/dia.py)
    return SchurFieldsplit(
        Aff.shape[0],
        solve_f,
        solve_S,
        device_matrix(Apf, dtype, row_emb=row_emb_pf),
    )
