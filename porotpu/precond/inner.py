"""Inner (per-field) approximate solvers for the block preconditioner.

Replaces the reference's per-field inner KSPs with prefixes s_/f_/p_/diff_
(lib/Preconditioner.py:77-100) and their two operating points:
- "exact": MUMPS sparse LU (petsc-options-exact:11-35) -> here a dense LU
  factorization on device (no sparse LU exists on TPU; documented
  substitution per SURVEY.md §2.3), valid for the small/medium test blocks,
  or a tight fixed-iteration CG for large ones.
- "inexact": hypre BoomerAMG-preconditioned CG with loose rtol
  (petsc-options-inexact:12-24) -> here smoothed-aggregation AMG V-cycles,
  optionally as fixed-iteration CG preconditioner (jit-friendly: iteration
  counts are static, matching the reference's max_it-capped philosophy).

Every InnerSolver is a pure callable b -> x usable inside jitted Krylov
loops.
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
from ..solvers.cg import cg_fixed
from ..solvers.chebyshev import chebyshev
from .amg import AMG, amg_setup


@dataclass
class InnerConfig:
    """Configuration of one inner solve (one prefix in the reference)."""

    method: str = "cg+amg"  # jacobi | chebyshev | cg | cg+amg | amg | lu
    iters: int = 5  # fixed iteration count for cg/chebyshev
    sweeps: int = 1  # AMG V-cycles per application
    # AMG setup knobs.  Defaults are the h-robust operating point measured
    # on the swelling/footing blocks (tools/amg_tune_solid.py): 2x2-node
    # lattice boxes + 2+2 Chebyshev sweeps hold the V-cycle contraction at
    # rho ~ 0.2-0.35 independent of mesh size, where the earlier 3x3-box /
    # 1+1-sweep point degraded to rho ~ 0.85 on the elasticity block and
    # leaked h-dependence into the outer iteration counts (the reference's
    # whole robustness claim rides on hypre BoomerAMG here,
    # petsc-options-inexact:16-24).
    amg_theta: float = 0.08
    amg_coarse_size: int = 600
    amg_presmooth: int = 2
    amg_postsmooth: int = 2
    # None = dimension-aware (2.0 in 2D, 3.0 in 3D — see amg_setup)
    amg_box_factor: float | None = None
    amg_smooth_degree: int = 1  # prolongator smoothing degree
    amg_cheb_lower: float = 4.0  # smoother interval [lmax/this, 1.1 lmax]
    # interpolation truncation (hypre analogue): relative row-max drop
    # tolerance applied to the smoothed prolongator; 0 = off
    amg_p_drop: float = 0.0
    # dense-LU size cap: above this, "lu" falls back to tight CG+AMG.
    # 40 V-cycle-preconditioned CG iterations reduce the error by ~1e-12
    # at the measured AMG contraction (rho <= 0.35) — "exact" for every
    # practical purpose at a fraction of the old 200-iteration cost.
    lu_max_size: int = 20000
    lu_fallback_iters: int = 40
    # chebyshev interval fraction: [lmax/cheb_frac, 1.1 lmax]
    cheb_frac: float = 30.0

    @classmethod
    def from_reference_options(cls, ksp_type: str, pc_type: str, maxiter: int = 10):
        """Map reference (inner ksp type, inner pc type) pairs onto methods.

        hypre->amg, lu/mumps->lu, none->jacobi
        (reference lib/Preconditioner.py:94-100 + options files).
        """
        pc = (pc_type or "").lower()
        ksp = (ksp_type or "").lower()
        if pc in ("lu", "mumps", "cholesky"):
            return cls(method="lu")
        if pc in ("hypre", "gamg", "amg", "boomeramg"):
            if ksp in ("preonly", ""):
                return cls(method="amg")
            return cls(method="cg+amg", iters=min(maxiter, 10))
        if pc in ("jacobi", "bjacobi", "none"):
            if ksp in ("preonly", ""):
                return cls(method="jacobi")
            return cls(method="cg", iters=min(maxiter, 20))
        # default: chebyshev stand-in
        return cls(method="chebyshev", iters=min(maxiter, 10))


@jax.tree_util.register_pytree_node_class
class InnerSolver:
    """A jit-friendly approximate solve for one (SPD-ish) block.

    ``monitor``/``label``: when enabled, every application prints the final
    true residual of the inner solve from inside the jitted computation
    (jax.debug.print) — the TPU-native replacement for the reference's
    per-inner-KSP-iteration monitors (lib/Preconditioner.py:94-100,
    inner_monitor; lib/Parser.py:27-28).  Static aux data: zero cost when
    disabled.
    """

    def __init__(
        self, kind, payload, iters=0, lmax=1.0, cheb_frac=30.0,
        monitor=False, label="",
    ):
        self.kind = kind  # static
        self.payload = payload  # pytree of device arrays
        self.iters = iters
        self.lmax = lmax
        self.cheb_frac = cheb_frac
        self.monitor = monitor
        self.label = label

    def tree_flatten(self):
        return (self.payload,), (
            self.kind, self.iters, self.lmax, self.cheb_frac,
            self.monitor, self.label,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], *aux[1:])

    def _monitored(self, b, x):
        if self.monitor and "A" in self.payload:
            r = b - self.payload["A"].matvec(x)
            jax.debug.print(
                "  [inner " + (self.label or self.kind) + "] |r|={r:.4e}",
                r=jnp.linalg.norm(r),
            )
        return x

    def __call__(self, b):
        k = self.kind
        if k == "identity":
            return b
        if k == "jacobi":
            return self.payload["dinv"] * b
        if k == "lu":
            # dense direct solve as an explicit-inverse matvec (MXU);
            # triangular lu_solve is a sequential latency chain on TPU
            return self.payload["inv"] @ b
        if k == "chebyshev":
            A = self.payload["A"]
            dinv = self.payload["dinv"]
            return self._monitored(b, chebyshev(
                A.matvec,
                b,
                self.lmax / self.cheb_frac,
                1.1 * self.lmax,
                iters=self.iters,
                M=lambda r: dinv * r,
            ))
        if k == "cg":
            A = self.payload["A"]
            dinv = self.payload["dinv"]
            return self._monitored(
                b, cg_fixed(A.matvec, b, M=lambda r: dinv * r, iters=self.iters)
            )
        if k == "amg":
            amg = self.payload["amg"]
            x = amg(b)
            for _ in range(self.iters - 1):
                x = x + amg(b - self.payload["A"].matvec(x))
            return self._monitored(b, x)
        if k == "cg+amg":
            A = self.payload["A"]
            amg = self.payload["amg"]
            return self._monitored(
                b, cg_fixed(A.matvec, b, M=amg, iters=self.iters)
            )
        if k == "plus-diag":
            # additive composite: base solve + diagonal term.  Used by the
            # discrete-Cahouet-Chabard Schur solver (precond/schur.py):
            # y = S_md^-1 b + w_visc diag^-1 b
            return self.payload["base"](b) + self.payload["wdiag"] * b
        if k == "fgmres+fs":
            # quasi-exact fp solve: fixed-iteration flexible GMRES on the
            # saddle fp BLOCK OPERATOR preconditioned by the Schur
            # fieldsplit — the tight-iterative substitute for the
            # reference's single MUMPS LU of the fp submatrix
            # (petsc-options-exact:31-35) above the dense cap.  One
            # fieldsplit APPLICATION alone is only a preconditioner (its
            # Schur block is approximate); iterating it to ~1e-12 makes
            # the fp solve exact to working precision, so outer counts can
            # be validated against the true dense-LU cells (ANALYSIS.md).
            from ..solvers.gmres import fgmres

            A = self.payload["A"]
            fs = self.payload["fs"]
            res = fgmres(
                A.matvec, b, M=fs, rtol=1e-12, atol=0.0,
                maxiter=self.iters, restart=self.iters,
            )
            return self._monitored(b, res.x)
        raise ValueError(f"unknown inner solver kind {self.kind}")


def remap_inner_iters(obj, iters: int):
    """Rebuild a PC pytree with a new static inner-iteration count.

    Aux-only change: AMG hierarchies and device payloads are reused as-is,
    so this is free (no host setup, no uploads).  Used to apply the
    ``inner iters`` parameter to preconditioners restored from a solver
    cache that was built with a different count.
    """
    from .block import BlockPreconditioner
    from .schur import SchurFieldsplit

    if isinstance(obj, InnerSolver):
        if obj.kind in ("cg+amg", "cg", "chebyshev", "amg"):
            return InnerSolver(
                obj.kind, obj.payload, iters, obj.lmax, obj.cheb_frac,
                obj.monitor, obj.label,
            )
        if obj.kind == "plus-diag":
            payload = dict(obj.payload)
            payload["base"] = remap_inner_iters(payload["base"], iters)
            return InnerSolver(
                obj.kind, payload, obj.iters, obj.lmax, obj.cheb_frac,
                obj.monitor, obj.label,
            )
        return obj
    if isinstance(obj, SchurFieldsplit):
        return SchurFieldsplit(
            obj.nf,
            remap_inner_iters(obj.solve_f, iters),
            remap_inner_iters(obj.solve_S, iters),
            obj.Apf,
        )
    if isinstance(obj, BlockPreconditioner):
        children, aux = obj.tree_flatten()
        children = tuple(
            remap_inner_iters(c, iters) if c is not None else None for c in children
        )
        return BlockPreconditioner.tree_unflatten(aux, children)
    from .block import CastPC

    if isinstance(obj, CastPC):
        return CastPC(
            remap_inner_iters(obj.inner, iters), obj.out_dtype, obj.in_dtype
        )
    return obj


def set_inner_monitor(obj, enable: bool, label: str = ""):
    """Rebuild a PC pytree with inner-solve monitoring toggled.

    Labels follow the reference's per-field KSP prefixes s_/f_/p_/diff_/fp_
    (lib/Preconditioner.py:77-92).  Aux-only change: device payloads are
    shared, so this is free.
    """
    from .block import BlockPreconditioner
    from .schur import SchurFieldsplit

    if isinstance(obj, InnerSolver):
        payload = obj.payload
        if obj.kind == "plus-diag":
            payload = dict(payload)
            payload["base"] = set_inner_monitor(
                payload["base"], enable, label or obj.label
            )
        return InnerSolver(
            obj.kind, payload, obj.iters, obj.lmax, obj.cheb_frac,
            enable, label or obj.label,
        )
    if isinstance(obj, SchurFieldsplit):
        return SchurFieldsplit(
            obj.nf,
            set_inner_monitor(obj.solve_f, enable, (label or "fp") + "_f"),
            set_inner_monitor(obj.solve_S, enable, (label or "fp") + "_S"),
            obj.Apf,
        )
    if isinstance(obj, BlockPreconditioner):
        names = {
            "solve_s": "s", "solve_fp": "fp", "solve_f": "f",
            "solve_p": "p", "solve_diff": "diff",
        }
        new = BlockPreconditioner.tree_unflatten(*reversed(obj.tree_flatten()))
        for attr, lab in names.items():
            child = getattr(new, attr)
            if child is not None and isinstance(
                child, (InnerSolver, SchurFieldsplit)
            ):
                setattr(new, attr, set_inner_monitor(child, enable, lab))
        return new
    from .block import CastPC

    if isinstance(obj, CastPC):
        return CastPC(
            set_inner_monitor(obj.inner, enable, label), obj.out_dtype,
            obj.in_dtype,
        )
    return obj


def build_inner_solver(
    A: sp.csr_matrix,
    cfg: InnerConfig,
    dofs_per_node: int = 1,
    near_nullspace: np.ndarray | None = None,
    coords: np.ndarray | None = None,
    dtype=jnp.float32,
) -> InnerSolver:
    """Factory: host setup (factorization / AMG hierarchy / spectrum)."""
    n = A.shape[0]
    method = cfg.method
    if method == "lu" and n > cfg.lu_max_size:
        # no sparse LU on TPU: tight-tolerance CG emulation (SURVEY §2.3)
        method = "cg+amg"
        cfg = InnerConfig(method="cg+amg", iters=cfg.lu_fallback_iters)

    if method == "identity":
        return InnerSolver("identity", {})

    diag = np.asarray(A.diagonal()).ravel()
    diag[diag == 0] = 1.0
    dinv = jnp.asarray(1.0 / diag, dtype=dtype)

    if method == "jacobi":
        return InnerSolver("jacobi", {"dinv": dinv})

    if method == "lu":
        inv = sla.inv(np.asarray(A.todense(), dtype=np.float64))
        return InnerSolver("lu", {"inv": jnp.asarray(inv, dtype=dtype)})

    if method == "chebyshev":
        from .amg import _power_lmax

        lmax = _power_lmax(A, np.asarray(1.0 / diag))
        return InnerSolver(
            "chebyshev",
            {"A": device_matrix(A, dtype), "dinv": dinv},
            iters=cfg.iters,
            lmax=lmax,
            cheb_frac=cfg.cheb_frac,
        )

    if method == "cg":
        return InnerSolver(
            "cg", {"A": device_matrix(A, dtype), "dinv": dinv}, iters=cfg.iters
        )

    if method in ("amg", "cg+amg"):
        amg = amg_setup(
            A,
            dofs_per_node=dofs_per_node,
            B=near_nullspace,
            theta=cfg.amg_theta,
            coarse_size=cfg.amg_coarse_size,
            presmooth=cfg.amg_presmooth,
            postsmooth=cfg.amg_postsmooth,
            coords=coords,
            box_factor=cfg.amg_box_factor,
            smooth_degree=cfg.amg_smooth_degree,
            cheb_lower=cfg.amg_cheb_lower,
            p_drop_tol=cfg.amg_p_drop,
            dtype=dtype,
        )
        # reuse the hierarchy's fine-level operator instead of a second
        # device copy of the same ELL (halves the per-block footprint)
        Eop = amg.levels[0].A if amg.levels else device_matrix(A, dtype)
        if method == "amg":
            return InnerSolver("amg", {"amg": amg, "A": Eop}, iters=max(cfg.sweeps, 1))
        return InnerSolver("cg+amg", {"amg": amg, "A": Eop}, iters=cfg.iters)

    raise ValueError(f"unknown inner method {cfg.method}")
