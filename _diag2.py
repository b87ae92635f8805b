"""Bisect the jitted-FGMRES slowdown on TPU."""
import pickle, time, sys
import numpy as np
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

with open(".cache/bench_6f7974800ff3fd0c.pkl", "rb") as fh:
    host = pickle.load(fh)
state = jax.tree_util.tree_map(lambda x: jnp.asarray(x), host)
jax.block_until_ready(state)
log("uploaded")

A, pc = state["A_dev"], state["pc"]
n = A.n
b = jnp.ones(n, dtype=jnp.float32)

from porotpu.solvers import fgmres
from porotpu.solvers.convergence import FieldwiseTest

sizes = tuple(A.sizes.values())

def run(tag, maxiter, fieldwise, use_pc):
    def _solve(A_dev, p, bb, x0):
        fw = FieldwiseTest.from_sizes(sizes, bb) if fieldwise else None
        M = p if use_pc else None
        return fgmres(A_dev.matvec, bb, x0=x0, M=M, restart=maxiter,
                      rtol=1e-6, atol=1e-8, maxiter=maxiter, fieldwise=fw)
    f = jax.jit(_solve)
    x0 = jnp.zeros(n, dtype=jnp.float32)
    t0 = time.perf_counter()
    r = f(A, pc, b, x0); r.x.block_until_ready()
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = f(A, pc, b, x0); r.x.block_until_ready()
    log(f"{tag}: maxiter={maxiter} fw={fieldwise} pc={use_pc} "
        f"compile+1st={tc:.1f}s run={time.perf_counter()-t0:.3f}s iters={int(r.iters)}")

run("plain-gmres-nopc", 10, False, False)
run("plain-gmres-pc", 10, False, True)
run("fw-gmres-pc", 10, True, True)
run("fw-gmres-pc-m100", 100, True, True)
