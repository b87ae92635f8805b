"""Which PC component faults the TPU inside fgmres?"""
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
ns, nfp = pc.ns, pc.nf + pc.np_

from porotpu.solvers import fgmres

CASE = sys.argv[1]

def runcase(tag, mk):
    def _solve(A_dev, p, bb, x0):
        return fgmres(A_dev.matvec, bb, x0=x0, M=mk(p), restart=10,
                      rtol=1e-10, atol=1e-12, maxiter=10)
    f = jax.jit(_solve)
    x0 = jnp.zeros(n, dtype=jnp.float32)
    t0 = time.perf_counter()
    r = f(A, pc, b, x0); r.x.block_until_ready()
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = f(A, pc, b, x0); r.x.block_until_ready()
    log(f"{tag}: compile+1st={tc:.1f}s run={time.perf_counter()-t0:.3f}s iters={int(r.iters)}")

if CASE == "jacobi":
    runcase("M=identity-ish", lambda p: (lambda x: 0.999 * x))
elif CASE == "solve_s":
    runcase("M=solve_s|I", lambda p: (lambda x: jnp.concatenate([p.solve_s(x[:ns]), x[ns:]])))
elif CASE == "solve_fp":
    runcase("M=I|solve_fp", lambda p: (lambda x: jnp.concatenate([x[:ns], p.solve_fp(x[ns:])])))
elif CASE == "coupling":
    runcase("M=coupling only", lambda p: (lambda x: jnp.concatenate(
        [x[:ns], x[ns:] - jnp.concatenate([p.Pfs.matvec(x[:ns]), p.Pps.matvec(x[:ns])])])))
elif CASE == "full":
    runcase("M=full pc", lambda p: p)
