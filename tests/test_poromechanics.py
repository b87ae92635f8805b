"""Golden integration tests for the 3-field poromechanics pipeline.

Oracle: scipy spsolve of the identical BC-applied monolithic system (the
matrices are assembled by our own pipeline; their correctness is covered
by the analytic tests in test_fem_basics/test_forms).  The preconditioned
iterative solutions must match the direct solve within the outer solver
tolerance — the rebuild's equivalent of "matching the reference's
converged results within its Krylov tolerance" (BASELINE.md), given the
reference pipeline cannot run in this environment (no FEniCS/PETSc).
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from porotpu.models import benchmarks
from porotpu.precond.inner import InnerConfig


def _step_with_direct(problem):
    """Advance one step; also return the direct solve of the same system.

    The RHS must be captured *before* solve_time_step rotates the history
    fields.
    """
    t = problem.t0 + problem.parameters["dt"]
    problem.create_solver()
    problem.first_timestep = False
    A, P, Pd, (bc_dofs, bc_vals) = problem._bc_applied_operators()
    b = np.asarray(problem.get_rhs(t))
    xref = spla.spsolve(A.tocsc(), b)
    its = problem.solve_time_step(t)
    return t, its, xref, A, b


@pytest.mark.parametrize(
    "pc_type",
    ["undrained", "diagonal", "lu", "diagonal 3-way-II"],
)
def test_footing_2way_matches_direct(pc_type):
    problem = benchmarks.footing(
        Nelements=4,
        overrides={
            "pc type": pc_type,
            "inner pc type": "lu",  # exact operating point (petsc-options-exact)
            "solver rtol": 1e-8,
            "solver atol": 1e-10,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged), f"{pc_type}: not converged"
    assert rel < 1e-5, f"{pc_type}: rel err {rel}"
    # exact inner solves => strong PC => few outer iterations
    assert its < 60, f"{pc_type}: {its} iterations"


def test_swelling_p3_solid_matches_direct():
    """--fe-solid 3 end-to-end (reference lib/Parser.py:23-24): the P3/P2/P1
    mixed discretization's jitted solve must match the scipy direct solve of
    the identical BC-applied monolithic system."""
    problem = benchmarks.swelling(
        Nelements=3,
        overrides={
            "fe degree solid": 3,
            "pc type": "diagonal",
            "inner pc type": "lu",
            "solver rtol": 1e-8,
            "solver atol": 1e-10,
        },
    )
    assert problem.W.space("s").degree == 3
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged)
    assert rel < 1e-5, f"P3 solid: rel err {rel}"
    assert its < 40, f"P3 solid: {its} iterations"


@pytest.mark.parametrize("pc_type", ["diagonal 3-way", "undrained 3-way"])
def test_footing_3way_matches_direct(pc_type):
    problem = benchmarks.footing(
        Nelements=4,
        overrides={
            "pc type": pc_type,
            "inner pc type": "lu",
            # 3-way weighted-sum PCs converge more slowly (research PCs);
            # the residual criterion is the reference's (rtol on fieldwise
            # rel inf-norm), and the ill-conditioned system leaves ~1e-4
            # solution error at this residual level
            "solver rtol": 1e-9,
            "solver atol": 1e-11,
            "solver maxiter": 400,
            # reference-parity unrestarted GMRES (lib/Solver.py:100): the
            # slow-converging 3-way research PCs degrade under the
            # memory-sane default restart of 50
            "gmres restart": 400,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged), f"{pc_type}: not converged"
    assert rel < 2e-4, f"{pc_type}: rel err {rel}"


def test_solver_chunk_matches_single_program():
    """"solver chunk" (python-level restarted continuation) must reproduce
    the single-program iteration count and solution when the chunk is a
    multiple of the restart length — the XLA:TPU long-f64-program
    workaround must not change the mathematics (output/ANALYSIS.md §6)."""
    common = {
        "pc type": "diagonal",
        "inner ksp type": "cg",
        "inner pc type": "hypre",
        "solver rtol": 1e-8,
        "solver atol": 1e-12,
        "gmres restart": 5,
    }
    its = {}
    xs = {}
    for name, extra in (("single", {}), ("chunked", {"solver chunk": 10})):
        problem = benchmarks.swelling(
            Nelements=8, overrides={**common, **extra}
        )
        t, it, xref, A, b = _step_with_direct(problem)
        assert bool(problem.last_result.converged)
        its[name] = it
        xs[name] = np.asarray(problem.sol)
    assert its["single"] == its["chunked"], its
    assert np.allclose(xs["single"], xs["chunked"], atol=1e-9)


def test_swelling_inexact_amg():
    problem = benchmarks.swelling(
        Nelements=8,
        overrides={
            "pc type": "diagonal",
            "inner ksp type": "cg",
            "inner pc type": "hypre",  # maps to cg+amg inner solves
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged)
    assert rel < 1e-5, f"rel err {rel}"
    assert its < 120


@pytest.mark.parametrize("schur_kind", ["dcc", "selfp"])
def test_swelling_schur_kinds_match_direct(schur_kind):
    """Both Schur preconditioners (dcc default / selfp reference-parity)
    converge to the direct solution; dcc is the h-robust default
    (precond/schur.py:mass_drag_schur)."""
    problem = benchmarks.swelling(
        Nelements=8,
        overrides={
            "pc type": "diagonal",
            "inner pc type": "hypre",
            "schur precondition": schur_kind,
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged), f"{schur_kind}: not converged"
    assert rel < 1e-5, f"{schur_kind}: rel err {rel}"
    assert its < 60, f"{schur_kind}: {its} iterations"


def test_swelling_aar_solver():
    problem = benchmarks.swelling(
        Nelements=6,
        overrides={
            "solver type": "aar",
            "pc type": "diagonal",
            "inner pc type": "lu",
            "solver rtol": 1e-10,
            "solver atol": 1e-14,
            "solver maxiter": 2000,
            "AAR omega": 1.0,
            "AAR beta": 1.0,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged)
    assert rel < 1e-5, f"rel err {rel}"


def test_swelling_3d_small():
    problem = benchmarks.swelling_3d(
        Nelements=3,
        overrides={
            "pc type": "diagonal",
            "inner pc type": "lu",
            "solver rtol": 1e-8,
            "solver atol": 1e-10,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    x = np.asarray(problem.sol)
    rel = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert bool(problem.last_result.converged)
    assert rel < 1e-5, f"rel err {rel}"


def test_time_loop_runs_and_history_rotates():
    problem = benchmarks.swelling(
        Nelements=4,
        overrides={
            "tf": 0.3,  # 3 steps
            "pc type": "diagonal",
            "inner pc type": "lu",
        },
    )
    iters = problem.solve()
    assert len(iters) == 3
    # after 3 steps the solution should be nonzero and finite
    assert np.all(np.isfinite(np.asarray(problem.sol)))
    assert np.linalg.norm(np.asarray(problem.us_nm1)) > 0
    assert np.linalg.norm(np.asarray(problem.us_nm2)) > 0


def test_loads_only_rhs_mode():
    # bug-compat mode: reference lib/Assembler.py:266-268 assembles only the
    # load terms; both modes must run
    problem = benchmarks.swelling(
        Nelements=4,
        overrides={"rhs mode": "loads-only", "inner pc type": "lu"},
    )
    t, its, xref, A, b = _step_with_direct(problem)
    assert bool(problem.last_result.converged)


def test_swelling_inner_accel_order_gmres():
    """"inner accel order 1" + gmres (swelling.py:75,
    lib/Preconditioner.py:248-249) through the model layer: the accelerated
    PC is threaded through the flexible reconstruction, so — unlike the
    reference's non-flexible outer, whose returned solution is corrupted by
    the stateful final PC apply (see
    test_ops_solvers.py::test_gmres_pc_accel_order) — the solve must still
    reach the direct solution within tolerance."""
    problem = benchmarks.swelling(
        Nelements=6,
        overrides={
            "solver type": "gmres",
            "pc type": "diagonal",
            "inner pc type": "lu",
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
            "inner accel order": 1,
        },
    )
    t, its, xref, A, b = _step_with_direct(problem)
    assert bool(problem.last_result.converged)
    x1 = np.asarray(problem.sol)
    rel = np.linalg.norm(x1 - xref) / np.linalg.norm(xref)
    assert rel < 1e-5, f"accelerated rel err {rel}"


def test_inner_monitor_and_pc_timings(capsys, monkeypatch):
    """Observability parity: "inner monitor" prints per-apply inner-solve
    residuals from inside the jitted solve (reference inner KSP monitors,
    lib/Parser.py:27-28), and print_timings reports the per-stage PC
    breakdown (lib/Preconditioner.py:252-260)."""
    monkeypatch.setenv("PORO_PC_TIMINGS", "1")  # conftest disables it suite-wide
    problem = benchmarks.swelling(
        Nelements=4,
        overrides={
            "pc type": "diagonal",
            "inner ksp type": "cg",
            "inner pc type": "hypre",
            "solver rtol": 1e-6,
            "solver atol": 1e-10,
            "inner monitor": True,
        },
    )
    t = problem.t0 + problem.parameters["dt"]
    problem.solve_time_step(t)
    import jax as _jax

    _jax.effects_barrier()
    out = capsys.readouterr().out
    assert "[inner s]" in out or "[inner fp_f]" in out, out[-2000:]

    st = problem.pc_timings(reps=2)
    assert st["total"] > 0 and st["solid"] > 0
    problem.print_timings()
    out = capsys.readouterr().out
    assert "Timing preconditioner" in out and "Solid solver" in out


def test_block_bc_path_matches_monolithic_oracle():
    """The production per-block BC+pad path (_bc_applied_blocks) must
    equal re-slicing the monolithic golden-oracle path
    (_bc_applied_operators) block by block, including padding and the
    unit diagonal on Dirichlet rows."""
    import numpy as np

    from porotpu.models import benchmarks

    for builder, ov in (
        (benchmarks.swelling, {"pc type": "diagonal 3-way", "inner pc type": "lu"}),
        (benchmarks.footing,
         {"pc type": "undrained", "inner pc type": "lu", "pad multiple": 8}),
    ):
        prob = builder(Nelements=4, overrides=dict(ov))
        A, P, Pd, (bcd, bcv) = prob._bc_applied_operators()
        Ab, Pb, Pd2, (bcd2, bcv2) = prob._bc_applied_blocks()
        assert np.array_equal(bcd, bcd2) and np.array_equal(bcv, bcv2)
        ns, nf, npp = prob.padded_sizes
        sl = {"s": slice(0, ns), "f": slice(ns, ns + nf),
              "p": slice(ns + nf, ns + nf + npp)}
        for r in ("s", "f", "p"):
            for c in ("s", "f", "p"):
                for M, blocks, tag in ((A, Ab, "A"), (P, Pb, "P")):
                    ref = M[sl[r], sl[c]].tocsr()
                    ref.eliminate_zeros()
                    got = blocks.get((r, c))
                    if got is None:
                        assert ref.nnz == 0, (tag, r, c)
                    else:
                        got = got.tocsr()
                        got.eliminate_zeros()
                        assert (ref != got).nnz == 0, (tag, r, c)
        if Pd is not None:
            assert (Pd.tocsr() != Pd2.tocsr()).nnz == 0
