"""Trace one full jitted solve with jax.profiler and print an op-time
breakdown.  Usage: python tools/trace_solve.py .cache/bench_<key>.pkl
"""

import glob
import gzip
import json
import os
import pickle
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    path = sys.argv[1]
    with open(path, "rb") as fh:
        host = pickle.load(fh)
    state = jax.tree_util.tree_map(jnp.asarray, host)
    jax.block_until_ready(state)
    log("uploaded")

    A, pc = state["A_dev"], state["pc"]
    n = A.n
    b = jnp.ones(n, dtype=jnp.float32)
    x0 = jnp.zeros_like(b)

    from porotpu.solvers import fgmres

    solve = jax.jit(
        lambda A, pc, b, x0: fgmres(
            lambda v: A.matvec(v), b, x0=x0, M=lambda v: pc(v),
            rtol=1e-6, atol=1e-8, maxiter=20,
        )
    )
    res = solve(A, pc, b, x0)
    jax.block_until_ready(res.x)
    log(f"warm solve done iters={int(res.iters)}")

    t0 = time.perf_counter()
    res = solve(A, pc, b, x0)
    jax.block_until_ready(res.x)
    log(f"unprofiled solve: {time.perf_counter()-t0:.2f}s")

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        res = solve(A, pc, b, x0)
        jax.block_until_ready(res.x)
    log("traced")

    # parse trace
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    log("trace files:", files)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                # keep device-lane events only (pid names carry /device:)
                name = ev.get("name", "?")
                agg[name] += ev["dur"]
                cnt[name] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        log(f"{dur/1e6:10.3f} s  x{cnt[name]:<7d} {name[:110]}")


if __name__ == "__main__":
    main()
