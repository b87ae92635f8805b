"""Isolate PC-inside-loop behavior on TPU."""
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

def timer(tag, f, *args, reps=3):
    t0 = time.perf_counter()
    y = f(*args); jax.block_until_ready(y)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    log(f"{tag}: compile+1st={tc:.1f}s run={(time.perf_counter()-t0)/reps*1e3:.2f}ms")

# 1. scan of 10 x (pc apply + matvec)
def scan10(A_dev, p, bb):
    def body(x, _):
        z = p(x)
        w = A_dev.matvec(z)
        return w / jnp.linalg.norm(w), None
    y, _ = jax.lax.scan(body, bb, None, length=10)
    return y
timer("scan10 pc+mv", jax.jit(scan10), A, pc, b)

# 2. while_loop of 10 x (pc apply + matvec)
def wl10(A_dev, p, bb):
    def cond(c):
        x, k = c
        return k < 10
    def body(c):
        x, k = c
        z = p(x)
        w = A_dev.matvec(z)
        return (w / jnp.linalg.norm(w), k + 1)
    y, _ = jax.lax.while_loop(cond, body, (bb, jnp.int32(0)))
    return y
timer("while10 pc+mv", jax.jit(wl10), A, pc, b)

# 3. solve_s alone in while loop
ss = pc.solve_s
bs = jnp.ones(pc.ns, dtype=jnp.float32)
def wl10s(s, bb):
    def cond(c): return c[1] < 10
    def body(c):
        x, k = c
        w = s(x)
        return (w / jnp.linalg.norm(w), k + 1)
    return jax.lax.while_loop(cond, body, (bb, jnp.int32(0)))[0]
timer("while10 solve_s", jax.jit(wl10s), ss, bs)

# 4. solve_fp alone in while loop
sfp = pc.solve_fp
bfp = jnp.ones(pc.nf + pc.np_, dtype=jnp.float32)
timer("while10 solve_fp", jax.jit(wl10s), sfp, bfp)
