"""The 3-field poromechanics problem (reference lib/Poromechanics.py).

Builds the mixed P2-vec x P2-vec x P1 space in field-major numbering,
assembles A / P / P_diff, applies Dirichlet BCs by row surgery, constructs
the block preconditioner + outer Krylov solver, and advances the time
loop.  The whole per-step solve (outer FGMRES + block-triangular PC +
inner AMG/Chebyshev/LU solves) is ONE jitted XLA computation — the
TPU-native inversion of the reference's per-iteration Python callback
design (SURVEY.md §7 architecture principle).
"""

from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..fem.bcs import apply_bcs_matrix, apply_bcs_vector, bc_dofs_values
from ..fem.dofmap import FunctionSpace, MixedSpace
from ..ops.sparse import ELL
from ..precond.amg import rigid_body_modes
from ..precond.block import BlockPreconditioner
from ..precond.inner import InnerConfig, InnerSolver, build_inner_solver
from ..precond.schur import build_schur_fieldsplit
from ..solvers import aar, cg, fgmres, gmres
from ..solvers.convergence import FieldwiseTest
from ..utils.printing import parprint
from .abstract import AbstractPhysics
from .forms import FIELDS, PC_TYPES, PoromechanicsAssembler


def _zero_csr(shape):
    return sp.csr_matrix(shape)


class Poromechanics(AbstractPhysics):
    def __init__(self, parameters, mesh, markers=None, parser=None, dtype=jnp.float64):
        super().__init__(parameters, mesh, parser)
        p = self.parameters
        self.dtype = dtype
        self.markers = markers

        Vs = FunctionSpace(mesh, p.get("fe degree solid", 2), vector=True)
        Vf = FunctionSpace(mesh, p.get("fe degree fluid", 2), vector=True)
        Qp = FunctionSpace(mesh, p.get("fe degree pressure", 1), vector=False)
        self.W = MixedSpace({"s": Vs, "f": Vf, "p": Qp})
        self.V = self.W  # reference naming parity (problem.V)

        self.pc_type = p["pc type"]
        if self.pc_type not in PC_TYPES:
            raise SystemExit(
                "pc type must be one of lu, undrained, diagonal, "
                "diagonal 3-way, diagonal 3-way-II."
            )
        self.three_way = "3-way" in self.pc_type and self.pc_type != "diagonal 3-way-II"
        self.two_way = not self.three_way

        parprint(
            "---- Problem dofs={}, h={}, solving with {} devices".format(
                self.W.num_dofs, mesh.hmin(), jax.device_count()
            )
        )

        self.assembler = PoromechanicsAssembler(p, self.W, self.three_way)
        self.assembler.assemble()

        n = self.W.num_dofs
        ns, nf, npp = self.W.get_dimensions()
        self.ns, self.nf, self.npp = ns, nf, npp

        # history fields (device), reference lib/Poromechanics.py:33-35
        self.us_nm1 = jnp.zeros(ns, dtype=dtype)
        self.us_nm2 = jnp.zeros(ns, dtype=dtype)
        self.uf_nm1 = jnp.zeros(nf, dtype=dtype)
        self.p_nm1 = jnp.zeros(npp, dtype=dtype)
        self.sol = jnp.zeros(n, dtype=dtype)

        self.first_timestep = True
        self.bcs = []
        self.bcs_diff = []
        self.bcs_sub_pressure = np.zeros(0, dtype=np.int64)
        self.iteration_log = []
        self.t_solve_total = 0.0

    # ------------------------------------------------------------------
    def set_bcs(self, bcs, bcs_diff):
        """Set Dirichlet BCs (assumed constant in time).

        bcs_diff are the pressure BCs used by the 3-way P_diff solve; the
        pressure-block-local dof map mirrors bcs_sub_pressure
        (lib/Poromechanics.py:39-56) — with field-major numbering it is
        just the within-field dof list.
        """
        t0 = _time.perf_counter()
        self.bcs = list(bcs)
        self.bcs_diff = list(bcs_diff)
        subs = [
            bc.local_dofs for bc in self.bcs_diff if bc.field == "p"
        ]
        self.bcs_sub_pressure = (
            np.unique(np.concatenate(subs)) if subs else np.zeros(0, np.int64)
        )
        parprint(
            "---- [BC] Created inverse pressure BC in {:.3f}s".format(
                _time.perf_counter() - t0
            )
        )

    # ------------------------------------------------------------------
    def _bc_applied_operators(self):
        """Monolithic A and P with BC row surgery; returns (A, P, Pdiff_pp, bc)."""
        W = self.W
        order = list(FIELDS)
        sizes = [W.field(k).size for k in order]

        def monolithic(blocks):
            grid = [
                [
                    blocks.get((r, c), None)
                    for c in order
                ]
                for r in order
            ]
            # replace None with explicit zero blocks for bmat
            for i, r in enumerate(order):
                for j, c in enumerate(order):
                    if grid[i][j] is None:
                        grid[i][j] = _zero_csr((sizes[i], sizes[j]))
            return sp.bmat(grid, format="csr")

        A = monolithic(self.assembler.A_blocks)
        P = monolithic(self.assembler.P_blocks)

        bc_dofs, bc_vals = bc_dofs_values(self.bcs)
        A = apply_bcs_matrix(A, bc_dofs)
        P = apply_bcs_matrix(P, bc_dofs)

        Pd = self.assembler.P_diff_pp
        if self.three_way and Pd is not None:
            # bcs rows: only pressure-field bcs of `bcs` touch the pp block
            p_off = W.offset("p")
            p_rows_main = [
                bc.local_dofs for bc in self.bcs if bc.field == "p"
            ]
            p_rows_diff = [bc.local_dofs for bc in self.bcs_diff if bc.field == "p"]
            rows = np.unique(
                np.concatenate(p_rows_main + p_rows_diff)
                if (p_rows_main or p_rows_diff)
                else np.zeros(0, np.int64)
            )
            Pd = apply_bcs_matrix(Pd.tocsr(), rows)
        return A, P, Pd, (bc_dofs, bc_vals)

    def _inner_cfg(self, block: str) -> InnerConfig:
        """Inner solver config for one block, with options-DB override.

        Replaces the PETSc options prefixes s_/f_/p_/diff_/fp_
        (lib/Preconditioner.py:77-92 + petsc-options files).
        """
        p = self.parameters
        odb = p.get("options db")
        if odb is not None:
            cfg = odb.inner_config(block)
            if cfg is not None:
                return cfg
        return InnerConfig.from_reference_options(
            p.get("inner ksp type", "gmres"),
            p.get("inner pc type", "hypre"),
            int(p.get("inner maxiter", 10)),
        )

    def create_solver(self):
        """Build device operators, block PC and the jitted outer solver."""
        t0 = _time.perf_counter()
        W = self.W
        ns, nf, npp = self.ns, self.nf, self.npp
        dtype = self.dtype

        A, P, Pd_pp, (bc_dofs, bc_vals) = self._bc_applied_operators()
        self.bc_dofs = jnp.asarray(bc_dofs)
        self.bc_vals = jnp.asarray(bc_vals, dtype=dtype)

        self.A_dev = ELL.from_csr(A, dtype)

        sl = {k: W.field(k).slice for k in FIELDS}
        P_ss = P[sl["s"], sl["s"]].tocsr()
        P_ff = P[sl["f"], sl["f"]].tocsr()
        P_pp = P[sl["p"], sl["p"]].tocsr()

        # near-nullspace for AMG on the vector blocks: rigid-body modes with
        # BC rows zeroed (reference sketches the same for GAMG, solid.py:132-168)
        Vs = W.space("s")
        B_s = rigid_body_modes(Vs.node_coords)
        mask_s = np.ones(ns, bool)
        mask_s[bc_dofs[bc_dofs < ns]] = False
        B_s = B_s * mask_s[:, None]
        Vf = W.space("f")
        B_f = rigid_body_modes(Vf.node_coords)
        f_bc = bc_dofs[(bc_dofs >= ns) & (bc_dofs < ns + nf)] - ns
        mask_f = np.ones(nf, bool)
        mask_f[f_bc] = False
        B_f = B_f * mask_f[:, None]

        dim = self.mesh.dim
        solve_s = build_inner_solver(
            P_ss, self._inner_cfg("s"), dofs_per_node=dim, near_nullspace=B_s, dtype=dtype
        )

        if self.two_way:
            cfg_fp = self._inner_cfg("fp")
            if cfg_fp.method == "lu":
                # exact operating point: single LU of the whole fp block
                # (petsc-options-exact:31-35)
                P_fpfp = P[ns:, ns:].tocsr()
                solve_fp = build_inner_solver(P_fpfp, cfg_fp, dtype=dtype)
            else:
                # inexact: Schur fieldsplit lower + selfp
                # (petsc-options-inexact:71-114)
                solve_fp = build_schur_fieldsplit(
                    P_ff,
                    P[sl["f"], sl["p"]].tocsr(),
                    P[sl["p"], sl["f"]].tocsr(),
                    P_pp,
                    self._inner_cfg("fp_fieldsplit_0"),
                    self._inner_cfg("fp_fieldsplit_1"),
                    dofs_per_node_f=dim,
                    dtype=dtype,
                )
            self.pc = BlockPreconditioner(
                ns,
                nf,
                npp,
                False,
                solve_s,
                solve_fp=solve_fp,
                Pfs=ELL.from_csr(P[sl["f"], sl["s"]].tocsr(), dtype),
                Pps=ELL.from_csr(P[sl["p"], sl["s"]].tocsr(), dtype),
            )
        else:
            solve_f = build_inner_solver(
                P_ff,
                self._inner_cfg("f"),
                dofs_per_node=dim,
                near_nullspace=B_f,
                dtype=dtype,
            )
            solve_p = build_inner_solver(P_pp, self._inner_cfg("p"), dtype=dtype)
            solve_diff = build_inner_solver(Pd_pp, self._inner_cfg("diff"), dtype=dtype)
            mask = np.ones(npp)
            mask[self.bcs_sub_pressure] = 0.0
            self.pc = BlockPreconditioner(
                ns,
                nf,
                npp,
                True,
                solve_s,
                solve_f=solve_f,
                solve_p=solve_p,
                solve_diff=solve_diff,
                Pfp=ELL.from_csr(P[sl["f"], sl["p"]].tocsr(), dtype),
                Psf=ELL.from_csr(P[sl["s"], sl["f"]].tocsr(), dtype),
                Psp=ELL.from_csr(P[sl["s"], sl["p"]].tocsr(), dtype),
                diff_rhs_mask=jnp.asarray(mask, dtype=dtype),
                w1=float(self.parameters.get("w1", 1.0)),
                w2=float(self.parameters.get("w2", 0.1)),
            )

        # history matrices for the full-residual RHS
        if self.assembler.rhs_mode == "full-residual":
            H = self.assembler.history_matrices()
            self.H_dev = {k: ELL.from_csr(v, dtype) for k, v in H.items()}
        else:
            self.H_dev = None

        p = self.parameters
        solver_type = p.get("solver type", "gmres")
        rtol = float(p.get("solver rtol", 1e-6))
        atol = float(p.get("solver atol", 1e-8))
        maxiter = int(p.get("solver maxiter", 500))
        use_fieldwise = bool(p.get("fieldwise convergence", True))

        sizes = (ns, nf, npp)

        # NOTE: the operator pytrees (A_dev, pc) are jit *arguments*, not
        # closure constants — closing over device matrices bakes them into
        # the executable and triggers XLA constant folding over the whole
        # sparse data (slow compiles, duplicated HBM).
        def _solve(A_dev, pc, b_dev, x0):
            fw = (
                FieldwiseTest.from_sizes(sizes, b_dev) if use_fieldwise else None
            )
            if solver_type == "aar":
                return aar(
                    A_dev.matvec,
                    b_dev,
                    M=pc,
                    x0=x0,
                    order=int(p.get("AAR order", 10)),
                    p=int(p.get("AAR p", 5)),
                    omega=float(p.get("AAR omega", 1.0)),
                    beta=float(p.get("AAR beta", 1.0)),
                    rtol=rtol,
                    atol=atol,
                    maxiter=maxiter,
                )
            if solver_type == "cg":
                return cg(
                    A_dev.matvec,
                    b_dev,
                    x0=x0,
                    M=pc,
                    rtol=rtol,
                    atol=atol,
                    maxiter=maxiter,
                    fieldwise=fw,
                )
            # gmres / fgmres: inner solves are iterative => flexible variant
            # (reference uses gmres; with non-constant PC fgmres is the
            # correct analogue)
            return fgmres(
                A_dev.matvec,
                b_dev,
                x0=x0,
                M=pc,
                restart=int(p.get("gmres restart", maxiter)),
                rtol=rtol,
                atol=atol,
                maxiter=maxiter,
                fieldwise=fw,
            )

        self._jit_solve = jax.jit(_solve)

        # jitted RHS history application
        if self.H_dev is not None:

            def _rhs_hist(H_dev, us1, us2, uf1, p1):
                rs = H_dev["s", "us1"].matvec(us1) + H_dev["s", "us2"].matvec(us2)
                rf = H_dev["f", "uf1"].matvec(uf1) + H_dev["f", "us1"].matvec(us1)
                rp = H_dev["p", "us1"].matvec(us1) + H_dev["p", "p1"].matvec(p1)
                return jnp.concatenate([rs, rf, rp])

            self._jit_rhs_hist = jax.jit(_rhs_hist)

        parprint(
            "---- [Solver] Solver created in {}s".format(_time.perf_counter() - t0)
        )

    # ------------------------------------------------------------------
    def get_rhs(self, t):
        loads = self.assembler.get_load_vector(t)
        b = jnp.asarray(loads, dtype=self.dtype)
        if self.H_dev is not None:
            b = b + self._jit_rhs_hist(
                self.H_dev, self.us_nm1, self.us_nm2, self.uf_nm1, self.p_nm1
            )
        # Dirichlet rows: b[dof] = bc value (lib/Poromechanics.py:76-83)
        b = b.at[self.bc_dofs].set(self.bc_vals)
        return b

    def solve_time_step(self, t):
        if self.first_timestep:
            self.create_solver()
            self.first_timestep = False

        b = self.get_rhs(t)
        t0 = _time.perf_counter()
        res = self._jit_solve(self.A_dev, self.pc, b, jnp.zeros_like(b))
        res.x.block_until_ready()
        self.t_solve_total += _time.perf_counter() - t0

        self.sol = res.x
        ns, nf = self.ns, self.nf
        us = res.x[:ns]
        uf = res.x[ns : ns + nf]
        pp = res.x[ns + nf :]
        # rotate history (lib/Poromechanics.py:93-97)
        self.us_nm2 = self.us_nm1
        self.us_nm1 = us
        self.uf_nm1 = uf
        self.p_nm1 = pp
        its = int(res.iters)
        self.iteration_log.append(its)
        self.last_result = res
        return its

    def solution_fields(self):
        return {
            "displacement": np.asarray(self.us_nm1),
            "fluid velocity": np.asarray(self.uf_nm1),
            "pressure": np.asarray(self.p_nm1),
        }

    def print_timings(self):
        parprint("\n===== Timing Solver: {:.3f}s".format(self.t_solve_total))
