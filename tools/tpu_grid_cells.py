"""Run individual robustness-grid cells on the TPU with explicit knobs.

Plan-B runner for the cells the plain f64 drivers cannot complete on
this device (output/ANALYSIS.md §7):

- f64 + CastPC (``pc dtype: float32``): halves the PC payload memory
  (the footing N=80 all-f64 program OOMs HBM) while keeping f64 outer
  Krylov/residual semantics; iteration-count equivalence is validated
  against the all-f64 CPU count on the N=40 cell before N=80 is
  reported.
- f32 cells: the f64 footing 3-way QUASI-EXACT program (60-iteration
  inner loops) trips the XLA:TPU long-f64-program crash even chunked;
  the f32 twin runs at any length.  f32-vs-f64 count equivalence is
  measured on the overlapping cells (footing 3-way inexact N=10: 196 at
  both precisions; qexact N=10 vs the dense-LU exact 194).

Every deviation from the all-f64 protocol is stamped into the .out
header so SUMMARY.md rows carry the label.

Usage: python tools/tpu_grid_cells.py CELL [CELL...]
       python tools/tpu_grid_cells.py --list
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

CELLS = {
    # name: (builder, N, pc type, options file, out file, extra overrides, tag)
    "f3w-inexact-40-castpc": (
        "footing", 40, "undrained 3-way", "petsc-options-inexact",
        "robustness-2d-footing-3way-inexact.out",
        {"dtype": "float64", "pc dtype": "float32", "solver chunk": 100},
        "[f64+f32pc validation]",
    ),
    "f3w-inexact-80-castpc": (
        "footing", 80, "undrained 3-way", "petsc-options-inexact",
        "robustness-2d-footing-3way-inexact.out",
        {"dtype": "float64", "pc dtype": "float32", "solver chunk": 100},
        "[f64+f32pc]",
    ),
    "f3w-inexact-40-f32": (
        "footing", 40, "undrained 3-way", "petsc-options-inexact",
        "robustness-2d-footing-3way-inexact.out",
        {"dtype": "float32", "solver chunk": 100, "solver maxiter": 600},
        "[f32 validation]",
    ),
    "f3w-inexact-80-f32": (
        "footing", 80, "undrained 3-way", "petsc-options-inexact",
        "robustness-2d-footing-3way-inexact.out",
        {"dtype": "float32", "solver chunk": 100, "solver maxiter": 800},
        "[f32]",
    ),
    "f3w-qexact-10-f32": (
        "footing", 10, "undrained 3-way", "petsc-options-exact-iterative",
        "robustness-2d-footing-3way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f3w-qexact-20-f32": (
        "footing", 20, "undrained 3-way", "petsc-options-exact-iterative",
        "robustness-2d-footing-3way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f3w-qexact-40-f32": (
        "footing", 40, "undrained 3-way", "petsc-options-exact-iterative",
        "robustness-2d-footing-3way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f3w-qexact-80-f32": (
        "footing", 80, "undrained 3-way", "petsc-options-exact-iterative",
        "robustness-2d-footing-3way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f2w-qexact-20-f32": (
        "footing", 20, "undrained", "petsc-options-exact-iterative",
        "robustness-2d-footing-2way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f2w-qexact-40-f32": (
        "footing", 40, "undrained", "petsc-options-exact-iterative",
        "robustness-2d-footing-2way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "f2w-qexact-80-f32": (
        "footing", 80, "undrained", "petsc-options-exact-iterative",
        "robustness-2d-footing-2way-qexact.out",
        {"dtype": "float32", "solver chunk": 100},
        "[f32]",
    ),
    "sw2-qexact-80": (
        "swelling", 80, "diagonal", "petsc-options-exact-iterative",
        "robustness-2d-swelling-2way-qexact.out",
        {"dtype": "float64", "solver chunk": 100},
        "",
    ),
    "sw3-qexact-80": (
        "swelling", 80, "diagonal 3-way", "petsc-options-exact-iterative",
        "robustness-2d-swelling-3way-qexact.out",
        {"dtype": "float64", "solver chunk": 100},
        "",
    ),
    "sw2-qexact-160": (
        "swelling", 160, "diagonal", "petsc-options-exact-iterative",
        "robustness-2d-swelling-2way-qexact.out",
        {"dtype": "float64", "solver chunk": 100},
        "",
    ),
    "sw3-qexact-160": (
        "swelling", 160, "diagonal 3-way", "petsc-options-exact-iterative",
        "robustness-2d-swelling-3way-qexact.out",
        {"dtype": "float64", "solver chunk": 100},
        "",
    ),
}


def run_cell(name):
    from porotpu.models import benchmarks
    from porotpu.utils.options import OptionsDB

    builder, N, pc, opts, outname, extra, tag = CELLS[name]
    outpath = os.path.join("output", outname)
    drv = {"footing": "footing.py", "swelling": "swelling.py"}[builder]
    header = f"{drv} pc='{pc}' N={N} opts={opts} {tag}".rstrip()
    print(header, flush=True)
    odb = OptionsDB.from_file(opts)
    overrides = {
        "pc type": pc,
        "options db": odb,
        "tf": 0.02,
        "solver cache path": f".cache/grid_{name}.pkl",
        **extra,
    }
    t0 = time.perf_counter()
    problem = getattr(benchmarks, builder)(Nelements=N, overrides=overrides)
    if not problem.try_load_solver_cache(overrides["solver cache path"]):
        problem.create_solver()
        problem.first_timestep = False
    its_list = problem.solve()
    its = its_list[-1]
    line = "-------- Solved time t={:.2f}. {} iterations in {:.2f}s".format(
        problem.t, its, time.perf_counter() - t0
    )
    with open(outpath, "a") as fh:
        fh.write("\n" + header + "\n" + line + "\n")
    print("cell done:", name, "iters:", its, flush=True)


if __name__ == "__main__":
    if "--list" in sys.argv[1:]:
        print("\n".join(CELLS))
        sys.exit(0)
    for nm in sys.argv[1:]:
        try:
            run_cell(nm)
        except Exception as e:  # keep the queue moving; log the failure
            print(f"CELL FAILED {nm}: {type(e).__name__} {str(e)[:120]}", flush=True)
