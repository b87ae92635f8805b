"""Physics-based block preconditioner application (the hot PC callback).

Re-implements PreconditionerCC.apply (reference lib/Preconditioner.py:141-250)
as a pure jit-friendly function over field-major vectors [s | f | p]:

- **2-way** (lib/Preconditioner.py:219-241): block lower-triangular sweep
    ys  = solve_s(xs)
    yfp = solve_fp(x_fp - Mfp_s ys)
  where solve_fp is a dense-LU ("exact") or Schur fieldsplit ("inexact")
  on the fluid-pressure block.

- **3-way** (lib/Preconditioner.py:150-212): two triangular sweeps p->f->s,
  one with the stabilized pressure mass (P), one with the pressure-diffusion
  operator (P_diff, with Dirichlet pressure rows of the RHS zeroed first,
  lines 172-173), combined as w1 * y_FS + w2 * y_diff (hardcoded
  w1=1.0, w2=0.1 at lib/Preconditioner.py:285).

All coupling blocks come from the *preconditioner* matrix P, mirroring
createSubMatrix(self.M, ...) at lib/Preconditioner.py:60-75.

In the reference this apply is a Python callback invoked from C every
Krylov iteration; here it traces into the outer FGMRES while_loop so the
whole iteration is one fused XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import ELL
from .inner import InnerSolver


@jax.tree_util.register_pytree_node_class
class BlockPreconditioner:
    def __init__(
        self,
        ns,
        nf,
        np_,
        three_way,
        solve_s: InnerSolver,
        solve_fp=None,  # 2-way: callable on the (nf+np) fp vector
        Pfs: ELL | None = None,  # 2-way coupling (fluid rows of Mfp_s)
        Pps: ELL | None = None,  # 2-way coupling (pressure rows of Mfp_s)
        solve_f: InnerSolver | None = None,  # 3-way
        solve_p: InnerSolver | None = None,  # 3-way
        solve_diff: InnerSolver | None = None,  # 3-way
        Pfp: ELL | None = None,  # 3-way Mf_p
        Psf: ELL | None = None,  # 3-way Ms_f
        Psp: ELL | None = None,  # 3-way Ms_p
        diff_rhs_mask=None,  # 3-way: 1 except 0 at pressure-BC dofs
        w1: float = 1.0,
        w2: float = 0.1,
    ):
        self.ns, self.nf, self.np_ = ns, nf, np_
        self.three_way = three_way
        self.solve_s = solve_s
        self.solve_fp = solve_fp
        self.Pfs, self.Pps = Pfs, Pps
        self.solve_f, self.solve_p, self.solve_diff = solve_f, solve_p, solve_diff
        self.Pfp, self.Psf, self.Psp = Pfp, Psf, Psp
        self.diff_rhs_mask = diff_rhs_mask
        self.w1, self.w2 = w1, w2

    def tree_flatten(self):
        children = (
            self.solve_s,
            self.solve_fp,
            self.Pfs,
            self.Pps,
            self.solve_f,
            self.solve_p,
            self.solve_diff,
            self.Pfp,
            self.Psf,
            self.Psp,
            self.diff_rhs_mask,
        )
        aux = (self.ns, self.nf, self.np_, self.three_way, self.w1, self.w2)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        ns, nf, np_, three_way, w1, w2 = aux
        return cls(ns, nf, np_, three_way, *children, w1=w1, w2=w2)

    def __call__(self, x):
        ns, nf, np_ = self.ns, self.nf, self.np_
        xs = x[:ns]
        xf = x[ns : ns + nf]
        xp = x[ns + nf :]

        if not self.three_way:
            ys = self.solve_s(xs)
            coup = jnp.concatenate([self.Pfs.matvec(ys), self.Pps.matvec(ys)])
            yfp = self.solve_fp(x[ns:] - coup)
            return jnp.concatenate([ys, yfp])

        # ---- 3-way double sweep --------------------------------------
        # pressures
        yp = self.solve_p(xp)
        xp_diff = xp * self.diff_rhs_mask  # zero Dirichlet pressure rows
        yp_diff = self.solve_diff(xp_diff)
        # fluids
        yf = self.solve_f(xf - self.Pfp.matvec(yp))
        yf_diff = self.solve_f(xf - self.Pfp.matvec(yp_diff))
        # solids
        ys = self.solve_s(xs - self.Psf.matvec(yf) - self.Psp.matvec(yp))
        ys_diff = self.solve_s(
            xs - self.Psf.matvec(yf_diff) - self.Psp.matvec(yp_diff)
        )
        # weighted CC sum (lib/Preconditioner.py:206-212)
        y_fs = jnp.concatenate([ys, yf, yp])
        y_diff = jnp.concatenate([ys_diff, yf_diff, yp_diff])
        return self.w1 * y_fs + self.w2 * y_diff


@jax.tree_util.register_pytree_node_class
class CastPC:
    """Mixed-precision preconditioner wrapper.

    Applies the wrapped PC in its own (lower) precision inside a
    higher-precision outer Krylov solve: the standard TPU operating point
    for matching the reference's all-f64 PETSc pipeline semantics —
    right-preconditioned FGMRES keeps residuals/orthogonalization in f64
    (so the converged solution meets f64 tolerances on the TRUE residual)
    while the PC payloads (AMG hierarchies, coupling blocks, dense
    factors) run at f32 speed and half the HBM traffic.  With right
    preconditioning the PC only maps residuals to search directions, so
    its precision affects the iteration count, never the attainable
    accuracy.
    """

    def __init__(self, inner, out_dtype, in_dtype):
        self.inner = inner
        self.out_dtype = np.dtype(out_dtype)
        self.in_dtype = np.dtype(in_dtype)

    def tree_flatten(self):
        return (self.inner,), (str(self.out_dtype), str(self.in_dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    def __call__(self, x):
        return self.inner(x.astype(self.in_dtype)).astype(self.out_dtype)
