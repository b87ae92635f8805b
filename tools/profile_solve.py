"""Profile where the jitted solve time goes, component by component.

Usage (run on the real TPU, after ``python bench.py`` has populated the
solver cache):

    python tools/profile_solve.py .cache/bench_<key>.pkl

Loads the CPU-staged solver state (operators + block preconditioner, see
``Poromechanics.create_solver``), uploads it once, and times each piece:
per-block SpMV, full FieldMatrix matvec, each inner solver, AMG levels,
the Schur fieldsplit, and the whole preconditioner apply.  Equivalent in
spirit to the reference's PC timing counters t_solid/t_fluid/t_press
(lib/Preconditioner.py:34-39,252-260), but offline so nothing perturbs
the production jit.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, reps=10):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def profile_amg(tag, amg):
    for i, lvl in enumerate(amg.levels):
        n, L = lvl.A.data.shape
        log(f"  [{tag}] amg level {i}: A=({n},{L}) P={lvl.P.data.shape} lmax={lvl.lmax:.3g}")
        xl = jnp.ones(n, dtype=lvl.A.data.dtype)
        tA = timeit(jax.jit(lambda b, x: b.matvec(x)), lvl.A, xl)
        tR = timeit(jax.jit(lambda b, x: b.rmatvec(x)), lvl.P, xl)
        xc = jnp.ones(lvl.P.ncols, dtype=lvl.P.data.dtype)
        tP = timeit(jax.jit(lambda b, x: b.matvec(x)), lvl.P, xc)
        log(f"    A.mv={tA*1e3:.3f}ms  P^T(scatter)={tR*1e3:.3f}ms  P.mv={tP*1e3:.3f}ms")
    nl = amg.coarse_inv.shape[0]
    xl = jnp.ones(nl, dtype=amg.coarse_inv.dtype)
    tLU = timeit(
        jax.jit(lambda inv, b: inv @ b), amg.coarse_inv, xl, reps=3
    )
    log(f"  [{tag}] coarse inverse ({nl}x{nl}) matvec: {tLU*1e3:.3f}ms")


def profile_inner(tag, solver, n):
    log(f"[{tag}] kind={solver.kind} iters={solver.iters}")
    x = jnp.ones(n, dtype=jnp.float32)
    t = timeit(jax.jit(lambda s, v: s(v)), solver, x, reps=3)
    log(f"[{tag}] apply: {t*1e3:.3f}ms")
    if "amg" in solver.payload:
        profile_amg(tag, solver.payload["amg"])


def main():
    path = sys.argv[1]
    with open(path, "rb") as fh:
        host = pickle.load(fh)
    t0 = time.perf_counter()
    state = jax.tree_util.tree_map(jnp.asarray, host)
    jax.block_until_ready(state)
    log(f"upload: {time.perf_counter() - t0:.1f}s")

    A, pc = state["A_dev"], state["pc"]

    for k, blk in sorted(A.blocks.items()):
        n, L = blk.data.shape
        x = jnp.ones(blk.ncols, dtype=blk.data.dtype)
        t = timeit(jax.jit(lambda b, x: b.matvec(x)), blk, x)
        log(f"block {k}: ({n},{L}) t={t*1e3:8.3f}ms  {n*L/t:.3e} nnz/s")

    xfull = jnp.ones(A.n, dtype=jnp.float32)
    t = timeit(jax.jit(lambda a, x: a.matvec(x)), A, xfull)
    log(f"FieldMatrix matvec: {t*1e3:.3f}ms")

    t = timeit(jax.jit(lambda p, x: p(x)), pc, xfull, reps=3)
    log(f"PC apply: {t*1e3:.3f}ms")

    if pc.solve_s is not None:
        profile_inner("solve_s", pc.solve_s, pc.ns)
    sfp = pc.solve_fp
    if sfp is not None:
        nfp = pc.nf + pc.np_
        log(f"solve_fp type: {type(sfp).__name__}")
        x = jnp.ones(nfp, dtype=jnp.float32)
        t = timeit(jax.jit(lambda s, v: s(v)), sfp, x, reps=3)
        log(f"solve_fp: {t*1e3:.3f}ms")
        if hasattr(sfp, "solve_f"):
            profile_inner("fp.solve_f", sfp.solve_f, pc.nf)
            profile_inner("fp.solve_S", sfp.solve_S, pc.np_)
    for name in ("solve_f", "solve_p", "solve_diff"):
        s = getattr(pc, name, None)
        if s is not None:
            n = {"solve_f": pc.nf, "solve_p": pc.np_, "solve_diff": pc.np_}[name]
            profile_inner(name, s, n)


if __name__ == "__main__":
    main()
