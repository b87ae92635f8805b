#!/usr/bin/env python3
"""Headline benchmark: swelling-3d time-step solve + SpMV throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: wall time of one preconditioned FGMRES solve of the swelling-3d
system (the reference's scaling target, swelling-3d.py) at ~100k dofs to
the reference tolerance, on one chip.  Baseline: the only absolute number
the reference publishes — 1.12 s for its ~100k-dof single-process solve
(solid.py:182-186 weak-scaling block; see BASELINE.md).
vs_baseline = baseline_time / our_time (>1 means faster than reference).

Extra diagnostics (SpMV nnz/s, iterations, dof count) go to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVE_S = 1.12  # reference solid.py:182-186, 1 proc, ~100k dofs


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    N = int(os.environ.get("BENCH_N", "10"))
    dtype = jnp.float32

    from porotpu.models import benchmarks
    from porotpu.utils import cache

    t0 = time.perf_counter()
    key = cache.config_key(bench="swelling3d", N=N, schema=2)
    cpath = f".cache/bench_{key}.pkl"
    problem = benchmarks.swelling_3d(
        Nelements=N,
        overrides={
            "pc type": "diagonal",
            "inner pc type": "hypre",
            "solver rtol": 1e-6,
            "solver atol": 1e-8,
            "solver maxiter": 100,
            "solver cache path": cpath,  # saved during create_solver (CPU-staged)
            # the benchmark solves the FIRST time step (history fields are
            # zero), so the history operators contribute nothing: skip
            # building/uploading them
            "rhs mode": "loads-only",
        },
        dtype=dtype,
    )
    if problem.try_load_solver_cache(cpath):
        log(f"setup (cached): {time.perf_counter() - t0:.1f}s, dofs={problem.W.num_dofs}")
    else:
        problem.create_solver()
        problem.first_timestep = False
        log(f"setup: {time.perf_counter() - t0:.1f}s, dofs={problem.W.num_dofs}")

    t = problem.t0 + problem.parameters["dt"]
    b = problem.get_rhs(t)
    x0 = jnp.zeros_like(b)

    # warmup / compile
    t0 = time.perf_counter()
    res = problem._jit_solve(problem.A_dev, problem.pc, b, x0)
    res.x.block_until_ready()
    log(
        f"compile+first solve: {time.perf_counter() - t0:.1f}s, "
        f"iters={int(res.iters)} converged={bool(res.converged)} "
        f"res={float(res.res):.3e}"
    )

    # timed solves
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = problem._jit_solve(problem.A_dev, problem.pc, b, x0)
        res.x.block_until_ready()
        times.append(time.perf_counter() - t0)
    solve_s = min(times)
    iters = int(res.iters)

    # SpMV throughput on the block operator
    A = problem.A_dev
    spmv = jax.jit(lambda a, x: a.matvec(x))
    y = spmv(A, b)
    y.block_until_ready()
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        y = spmv(A, y)
    y.block_until_ready()
    spmv_s = (time.perf_counter() - t0) / reps
    nnz_padded = sum(int(e.nnz_padded) for e in A.blocks.values())
    log(
        f"solve: {solve_s:.4f}s ({iters} iters), "
        f"SpMV: {spmv_s * 1e3:.3f}ms, padded nnz/s={nnz_padded / spmv_s:.3e}"
    )

    print(
        json.dumps(
            {
                "metric": "swelling3d_step_solve_time",
                "value": round(solve_s, 5),
                "unit": "s",
                "vs_baseline": round(BASELINE_SOLVE_S / solve_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
