"""On-device component profile with dispatch-amortized timing.

Wraps each component in lax.scan(k times) inside ONE jit call, so the
axon tunnel's per-dispatch latency (ms-scale) doesn't pollute the
measurement.  Usage:

    python tools/profile_device.py .cache/bench_<key>.pkl
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit_scan(f, args, k=50, reps=3):
    """Time f applied k times sequentially inside one jit."""

    def chain(args):
        x0 = args[-1]

        def body(x, _):
            y = f(*args[:-1], x)
            # keep shape: renormalize into x0's shape if needed
            return y, ()

        y, _ = jax.lax.scan(body, x0, None, length=k)
        return y

    g = jax.jit(chain)
    y = g(args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = g(args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / (reps * k)


def main():
    path = sys.argv[1]
    with open(path, "rb") as fh:
        host = pickle.load(fh)
    t0 = time.perf_counter()
    state = jax.tree_util.tree_map(jnp.asarray, host)
    jax.block_until_ready(state)
    log(f"upload: {time.perf_counter() - t0:.1f}s")

    A, pc = state["A_dev"], state["pc"]
    n = A.n
    x = jnp.ones(n, dtype=jnp.float32)

    t = timeit_scan(lambda a, v: a.matvec(v) / jnp.linalg.norm(a.matvec(v)), (A, x), k=20)
    log(f"A matvec(+norm):   {t*1e3:9.3f} ms")

    t = timeit_scan(lambda p, v: p(v), (pc, x), k=5)
    log(f"PC apply:          {t*1e3:9.3f} ms")

    xs = jnp.ones(pc.ns, dtype=jnp.float32)
    t = timeit_scan(lambda s, v: s(v), (pc.solve_s, xs), k=5)
    log(f"solve_s (cg+amg):  {t*1e3:9.3f} ms")

    sfp = pc.solve_fp
    if sfp is not None:
        xfp = jnp.ones(pc.nf + pc.np_, dtype=jnp.float32)
        t = timeit_scan(lambda s, v: s(v), (sfp, xfp), k=5)
        log(f"solve_fp (schur):  {t*1e3:9.3f} ms")
        xf = jnp.ones(pc.nf, dtype=jnp.float32)
        t = timeit_scan(lambda s, v: s(v), (sfp.solve_f, xf), k=5)
        log(f"fp.solve_f:        {t*1e3:9.3f} ms")
        amg = sfp.solve_f.payload["amg"]
        t = timeit_scan(lambda a, v: a(v), (amg, xf), k=5)
        log(f"fp.solve_f amg V:  {t*1e3:9.3f} ms")
        t = _time_coarse(amg)
        log(f"fp coarse {amg.coarse_inv.shape[0] if hasattr(amg, 'coarse_inv') else amg.coarse_lu.shape[0]}: {t*1e3:9.3f} ms")

    if pc.solve_s is not None and "amg" in pc.solve_s.payload:
        amg = pc.solve_s.payload["amg"]
        t = timeit_scan(lambda a, v: a(v), (amg, xs), k=5)
        log(f"solve_s amg V:     {t*1e3:9.3f} ms")
        t = _time_coarse(amg)
        log(f"s coarse:          {t*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
