"""Diagnose where the bench solve time goes (run on real TPU)."""
import pickle, time, sys
import numpy as np
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

with open(".cache/bench_6f7974800ff3fd0c.pkl", "rb") as fh:
    host = pickle.load(fh)

t0 = time.perf_counter()
state = jax.tree_util.tree_map(lambda x: jnp.asarray(x), host)
jax.block_until_ready(state)
log(f"upload: {time.perf_counter()-t0:.1f}s")

A = state["A_dev"]
pc = state["pc"]

def timeit(f, *args, reps=10):
    y = f(*args); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps

# per-block SpMV
for k, blk in sorted(A.blocks.items()):
    n, L = blk.data.shape
    x = jnp.ones(blk.ncols, dtype=blk.data.dtype)
    f = jax.jit(lambda b, x: b.matvec(x))
    t = timeit(f, blk, x)
    log(f"block {k}: shape=({n},{L}) ncols={blk.ncols} t={t*1e3:8.3f}ms  {n*L/t:.3e} nnz/s")

xfull = jnp.ones(A.n, dtype=jnp.float32)
fm = jax.jit(lambda a, x: a.matvec(x))
t = timeit(fm, A, xfull)
log(f"FieldMatrix matvec: {t*1e3:.3f}ms")

# PC apply
fpc = jax.jit(lambda p, x: p(x))
t = timeit(fpc, pc, xfull, reps=3)
log(f"PC apply: {t*1e3:.3f}ms")

# inner pieces
ss = pc.solve_s
log(f"solve_s kind={ss.kind} iters={ss.iters}")
xs = jnp.ones(pc.ns, dtype=jnp.float32)
t = timeit(jax.jit(lambda s, x: s(x)), ss, xs, reps=3)
log(f"solve_s: {t*1e3:.3f}ms")
if "amg" in ss.payload:
    amg = ss.payload["amg"]
    for i, lvl in enumerate(amg.levels):
        n, L = lvl.A.data.shape
        log(f"  amg level {i}: A=({n},{L}) P=({lvl.P.data.shape}) lmax={lvl.lmax:.3g}")
        xl = jnp.ones(n, dtype=jnp.float32)
        tA = timeit(jax.jit(lambda b, x: b.matvec(x)), lvl.A, xl)
        # restriction scatter-add
        tR = timeit(jax.jit(lambda b, x: b.rmatvec(x)), lvl.P, xl)
        xc = jnp.ones(lvl.P.ncols, dtype=jnp.float32)
        tP = timeit(jax.jit(lambda b, x: b.matvec(x)), lvl.P, xc)
        log(f"    A.mv={tA*1e3:.3f}ms  P^T(scatter)={tR*1e3:.3f}ms  P.mv={tP*1e3:.3f}ms")
    log(f"  coarse LU size: {amg.coarse_lu.shape}")
    xl = jnp.ones(amg.coarse_lu.shape[0], dtype=jnp.float32)
    tLU = timeit(jax.jit(lambda lu, piv, b: jax.scipy.linalg.lu_solve((lu, piv), b)), amg.coarse_lu, amg.coarse_piv, xl, reps=3)
    log(f"  coarse LU solve: {tLU*1e3:.3f}ms")

sfp = pc.solve_fp
log(f"solve_fp type: {type(sfp).__name__}")
xfp = jnp.ones(pc.nf + pc.np_, dtype=jnp.float32)
t = timeit(jax.jit(lambda s, x: s(x)), sfp, xfp, reps=3)
log(f"solve_fp: {t*1e3:.3f}ms")
