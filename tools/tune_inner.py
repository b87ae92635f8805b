#!/usr/bin/env python3
"""Sweep the fixed inner-iteration count on the cached bench problem.

Loads the bench solver cache (device operators already staged), rebuilds the
block PC with different static inner iteration counts (aux-only change: the
AMG hierarchies / device payloads are reused as-is), and times the full
jitted solve for each.  Run on the real TPU, one process at a time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remap_kind(obj, kind_from, kind_to, iters):
    """Switch inner-solver kind (e.g. cg+amg -> amg preonly) + iters."""
    from porotpu.precond.block import BlockPreconditioner
    from porotpu.precond.inner import InnerSolver
    from porotpu.precond.schur import SchurFieldsplit

    if isinstance(obj, InnerSolver):
        if obj.kind == kind_from:
            return InnerSolver(kind_to, obj.payload, iters, obj.lmax, obj.cheb_frac)
        return obj
    if isinstance(obj, SchurFieldsplit):
        return SchurFieldsplit(
            obj.nf,
            remap_kind(obj.solve_f, kind_from, kind_to, iters),
            remap_kind(obj.solve_S, kind_from, kind_to, iters),
            obj.Apf,
        )
    if isinstance(obj, BlockPreconditioner):
        children, aux = obj.tree_flatten()
        children = tuple(
            remap_kind(c, kind_from, kind_to, iters) if c is not None else None
            for c in children
        )
        return BlockPreconditioner.tree_unflatten(aux, children)
    return obj


def main():
    N = int(os.environ.get("BENCH_N", "10"))
    sweep = [int(s) for s in os.environ.get("SWEEP", "10,5,3,2").split(",")]

    from porotpu.models import benchmarks
    from porotpu.utils import cache

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
            "solver cache path": cpath,
            "rhs mode": "loads-only",
        },
        dtype=jnp.float32,
    )
    t0 = time.perf_counter()
    if not problem.try_load_solver_cache(cpath):
        problem.create_solver()
        problem.first_timestep = False
    log(f"setup: {time.perf_counter() - t0:.1f}s dofs={problem.W.num_dofs}")

    t = problem.t0 + problem.parameters["dt"]
    b = problem.get_rhs(t)
    x0 = jnp.zeros_like(b)

    from porotpu.precond.inner import remap_inner_iters

    preonly = os.environ.get("PREONLY", "0") == "1"
    for it in sweep:
        if preonly:  # pure V-cycle(s), no CG wrapper
            pc = remap_kind(problem.pc, "cg+amg", "amg", it)
        else:
            pc = remap_inner_iters(problem.pc, it)
        t0 = time.perf_counter()
        res = problem._jit_solve(problem.A_dev, pc, b, x0)
        res.x.block_until_ready()
        tc = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = problem._jit_solve(problem.A_dev, pc, b, x0)
            res.x.block_until_ready()
            times.append(time.perf_counter() - t0)
        log(
            f"inner_iters={it:3d}: solve={min(times):.4f}s outer={int(res.iters)} "
            f"converged={bool(res.converged)} res={float(res.res):.3e} "
            f"(compile+1st {tc:.1f}s)"
        )


if __name__ == "__main__":
    main()
