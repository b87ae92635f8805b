#!/usr/bin/env python3
"""Headline benchmark: swelling-3d time-step solve + SpMV throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: wall time of one preconditioned FGMRES solve of the swelling-3d
system (the reference's scaling target, swelling-3d.py) at N=13 —
120,842 dofs, i.e. MORE than the baseline's ~100k dofs/core — to the
reference tolerance, on one chip.  Baseline: the only absolute number
the reference publishes — 1.12 s for its ~100k-dof single-process solve
(solid.py:182-186 weak-scaling block; see BASELINE.md).
vs_baseline = baseline_time / our_time (>1 means faster than reference).

The headline runs f32 with a TRUE-residual fieldwise convergence guard
(the f32 solve must reach the reference's convergence measure on the
recomputed b - A x).  A second, like-for-like **f64 datapoint** (the
reference's PETSc pipeline is all-f64) is then run and logged to stderr
as `f64 datapoint: {...}` — disable with BENCH_F64=0.

Extra diagnostics (SpMV nnz/s, iterations, dof count) go to stderr.
"""

import contextlib
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


def fetch(x):
    """Force device completion by fetching a result-dependent scalar.

    On the axon tunnel backend ``block_until_ready`` returns at ENQUEUE,
    not completion (measured: a blocked-each 8192^3 matmul "took" 0.14ms
    = 8 PFLOP/s), so every timing below is terminated by a host fetch of
    a scalar that depends on the computation.  The tunnel round trip this
    adds is measured once (``measure_rtt``) and subtracted.
    """
    return float(jnp.ravel(x)[0])


def measure_rtt(dtype):
    one = jnp.ones((8,), dtype=dtype)
    f = jax.jit(lambda x, s: x * s)
    scales = [jnp.asarray(1.0 + 0.01 * i, dtype=dtype) for i in range(8)]
    fetch(f(one, scales[-1]))
    ts = []
    for s in scales[:5]:
        t0 = time.perf_counter()
        fetch(f(one, s))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build_problem(
    dtype_name, dtype, N, pc_dtype, inner_ksp, inner_iters,
    amg_box, amg_sweeps, amg_over,
):
    """Build (or cache-restore) the bench problem at the given precisions."""
    from porotpu.models import benchmarks
    from porotpu.utils import cache

    # 128-aligned padded layout: makes every field block and level-0 AMG
    # operator eligible for the Pallas banded-matvec kernel
    # (ops/pallas_dia.py); <1% extra rows at bench sizes
    pad = int(os.environ.get("BENCH_PAD", "128"))
    t0 = time.perf_counter()
    key = cache.config_key(
        bench="swelling3d", N=N, schema=5, ksp=inner_ksp, ii=inner_iters,
        box=amg_box or "auto", sw=amg_sweeps or "auto", dt=dtype_name,
        pcdt=pc_dtype or dtype_name, pad=pad,
        pdrop=amg_over.get("amg p drop", 0.0),
    )
    cpath = f".cache/bench_{key}.pkl"
    problem = benchmarks.swelling_3d(
        Nelements=N,
        overrides={
            "pc type": "diagonal",
            "inner ksp type": inner_ksp,
            "inner pc type": "hypre",
            "inner iters": inner_iters,
            **amg_over,
            "solver rtol": 1e-6,
            "solver atol": 1e-8,
            "solver maxiter": 100,
            "solver cache path": cpath,  # saved during create_solver (CPU-staged)
            # the benchmark solves the FIRST time step (history fields are
            # zero), so the history operators contribute nothing: skip
            # building/uploading them
            "rhs mode": "loads-only",
            "pad multiple": pad,
            "dtype": dtype_name,
            **({"pc dtype": pc_dtype} if pc_dtype else {}),
        },
        dtype=dtype,
    )
    if problem.try_load_solver_cache(cpath):
        log(f"setup (cached): {time.perf_counter() - t0:.1f}s, dofs={problem.W.num_dofs}")
    else:
        problem.create_solver()
        problem.first_timestep = False
        log(f"setup: {time.perf_counter() - t0:.1f}s, dofs={problem.W.num_dofs}")
    return problem


def _bench_knobs():
    inner_ksp = os.environ.get("BENCH_INNER_KSP", "preonly")
    inner_iters = int(os.environ.get("BENCH_INNER_ITERS", "1"))
    amg_box = os.environ.get("BENCH_AMG_BOX")
    amg_sweeps = os.environ.get("BENCH_AMG_SWEEPS")
    # band-wise interpolation truncation (precond/amg.py): 0.05 measured
    # iteration-neutral while dropping ~43% of the smoothed P's stored
    # diagonals — the dominant V-cycle traffic (PERF.md)
    amg_pdrop = os.environ.get("BENCH_AMG_PDROP", "0.05")
    amg_over = {}
    if amg_box:
        amg_over["amg box factor"] = float(amg_box)
    if amg_sweeps:
        amg_over["amg presmooth"] = amg_over["amg postsmooth"] = int(amg_sweeps)
    if float(amg_pdrop) > 0:
        amg_over["amg p drop"] = float(amg_pdrop)
    return inner_ksp, inner_iters, amg_box, amg_sweeps, amg_over


def run_bench_ir(N):
    """f64-ACCURACY datapoint via f32 solve + f64 iterative refinement.

    The whole loop is ONE jitted while_loop: solve the f32 system for a
    correction against the current f64 TRUE residual (b - A64 x), add,
    re-check the field-wise criterion in f64 at the REFERENCE tolerances
    (atol 1e-8 / rtol 1e-6), repeat (<= 4 passes).  Accuracy is certified
    by f64 arithmetic on the true residual; speed is f32-class because
    the Krylov + PC work runs entirely in f32.
    """
    jax.config.update("jax_enable_x64", True)
    from porotpu.solvers.convergence import FieldwiseTest

    inner_ksp, inner_iters, amg_box, amg_sweeps, amg_over = _bench_knobs()
    p32 = build_problem(
        "float32", jnp.float32, N, None, inner_ksp, inner_iters,
        amg_box, amg_sweeps, amg_over,
    )
    p64 = build_problem(
        "float64", jnp.float64, N, "float32", inner_ksp, inner_iters,
        amg_box, amg_sweeps, amg_over,
    )
    t = p64.t0 + p64.parameters["dt"]
    b64 = p64.get_rhs(t)
    sizes = p64.padded_sizes
    atol, rtol = 1e-8, 1e-6
    solve32 = p32._solve_fn

    def ir(A32, pc32, A64, b64):
        # built inside the traced function: closing over a device array
        # would trigger XLA constant folding over it (CLAUDE.md invariant)
        x0_32 = jnp.zeros(b64.shape[0], dtype=jnp.float32)
        fw = FieldwiseTest.from_sizes(sizes, b64)

        def cond(c):
            x, r, ea, er, k, it = c
            return (ea > atol) & (er > rtol) & (k < 4)

        def body(c):
            x, r, ea, er, k, it = c
            res = solve32(A32, pc32, r.astype(jnp.float32), x0_32)
            x = x + res.x.astype(jnp.float64)
            r = b64 - A64.matvec(x)
            ea, er = fw.errors(r)
            return (x, r, ea, er, k + 1, it + res.iters)

        big = jnp.array(jnp.inf, dtype=jnp.float64)
        init = (
            jnp.zeros_like(b64), b64, big, big,
            jnp.int32(0), jnp.int32(0),
        )
        x, r, ea, er, k, it = jax.lax.while_loop(cond, body, init)
        return x, ea, er, k, it

    jit_ir = jax.jit(ir)
    rtt = measure_rtt(jnp.float64)

    t0 = time.perf_counter()
    x, ea, er, k, it = jit_ir(p32.A_dev, p32.pc, p64.A_dev, b64)
    float(ea)
    log(
        f"compile+first IR solve: {time.perf_counter() - t0:.1f}s, "
        f"passes={int(k)} total f32 iters={int(it)} "
        f"true-f64 fieldwise abs={float(ea):.3e} rel={float(er):.3e}"
    )
    if not (float(ea) <= atol or float(er) <= rtol):
        raise RuntimeError("IR did not reach the reference f64 tolerance")

    times = []
    for trial in range(2):
        bt = b64 * (1.0 + 1e-6 * (trial + 1))
        jax.block_until_ready(bt)
        t0 = time.perf_counter()
        x, ea, er, k, it = jit_ir(p32.A_dev, p32.pc, p64.A_dev, bt)
        float(ea)
        times.append(time.perf_counter() - t0 - rtt)
    solve_s = min(times)
    log(
        f"IR solve: {solve_s:.4f}s (passes={int(k)}, f32 iters={int(it)}, "
        f"true-f64 fieldwise abs={float(ea):.3e} rel={float(er):.3e})"
    )
    return {
        "metric": "swelling3d_step_solve_time",
        "value": round(solve_s, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_SOLVE_S / solve_s, 3),
        "dtype": "float64-accuracy (f32 solve + f64 iterative refinement)",
        "passes": int(k),
        "iters": int(it),
        "dofs": int(p64.W.num_dofs),
    }


def run_bench(dtype_name, N, strict=True, pc_dtype=None):
    """One full bench pass at the given dtype; returns the record dict.

    strict=True exits the process on a failed convergence guard (the
    headline datapoint must be valid); strict=False raises instead so a
    secondary datapoint can be reported as failed without killing the run.
    pc_dtype: optional lower precision for the preconditioner payloads
    (mixed-precision operating point, precond/block.py:CastPC) — the
    outer FGMRES/residual arithmetic and the convergence guard stay at
    ``dtype_name``.
    """
    if dtype_name in ("float64", "f64", "double"):
        jax.config.update("jax_enable_x64", True)
        dtype_name = "float64"
        dtype = jnp.float64
    else:
        dtype = jnp.float32
    if pc_dtype == dtype_name:
        pc_dtype = None

    # inner operating point (tuned on-device, tools/tune_inner.py):
    # ONE AMG V-cycle applied directly (ksp preonly) per field block per PC
    # apply — more outer FGMRES iterations than the 10-inner-CG
    # configuration, but each a fraction of the cost; AMG knobs env-tunable
    inner_ksp, inner_iters, amg_box, amg_sweeps, amg_over = _bench_knobs()

    problem = build_problem(
        dtype_name, dtype, N, pc_dtype, inner_ksp, inner_iters,
        amg_box, amg_sweeps, amg_over,
    )

    t = problem.t0 + problem.parameters["dt"]
    b = problem.get_rhs(t)
    x0 = jnp.zeros_like(b)

    rtt = measure_rtt(dtype)
    log(f"tunnel round trip: {rtt * 1e3:.1f}ms")

    # warmup / compile
    t0 = time.perf_counter()
    res = problem._jit_solve(problem.A_dev, problem.pc, b, x0)
    float(res.res)  # fetch: forces completion (see fetch())
    log(
        f"compile+first solve [{dtype_name}]: {time.perf_counter() - t0:.1f}s, "
        f"iters={int(res.iters)} converged={bool(res.converged)} "
        f"res={float(res.res):.3e}"
    )

    # timed solves — each repetition uses a *distinct* RHS (tiny relative
    # perturbations, same convergence behavior) so any result-dedup cache
    # in the device transport cannot return a stale answer without running
    # the computation; completion is forced by fetching the residual
    # scalar of the LAST solve (in-order device stream), and the single
    # tunnel round trip is subtracted
    times = []
    for trial in range(2):
        bs = [b * (1.0 + 1e-6 * (3 * trial + i + 1)) for i in range(3)]
        jax.block_until_ready(bs)
        t0 = time.perf_counter()
        for bi in bs:
            res = problem._jit_solve(problem.A_dev, problem.pc, bi, x0)
        float(res.res)
        times.append((time.perf_counter() - t0 - rtt) / 3)
    solve_s = min(times)
    iters = int(res.iters)
    log("per-trial mean solve times: " + ", ".join(f"{t:.4f}s" for t in times))

    # correctness guard: recompute the solver's own convergence measure
    # (field-wise inf-norm test, reference lib/Solver.py:8-51) from the
    # TRUE residual b - A x of the last timed solve — a solve that "timed
    # fast" but did not actually run/converge cannot pass this
    from porotpu.solvers.convergence import FieldwiseTest

    fw = FieldwiseTest.from_sizes(problem.padded_sizes, bs[-1])
    rvec = bs[-1] - problem.A_dev.matvec(res.x)
    ea, er = fw.errors(rvec)
    log(f"true residual fieldwise: abs={float(ea):.3e} rel={float(er):.3e}")
    if not bool(res.converged) or not (float(ea) < 1e-7 or float(er) < 1e-5):
        log(f"BENCH INVALID [{dtype_name}]: solve did not converge to a correct solution")
        if strict:
            sys.exit(1)
        raise RuntimeError("secondary bench datapoint failed its convergence guard")

    # SpMV throughput on the block operator and the chip's stream peak,
    # both via the shared fori_loop-chain R2-R1 delta methodology
    # (porotpu/utils/roofline.py — ONE peak methodology in the tree, the
    # same code path as tools/roofline.py / PERF.md).  The banded sweep's
    # traffic floor is one read of the diagonal data + one read of x +
    # one write of y per matvec (the shifted slices of x re-read cached
    # lines; charged once — the DATA stream dominates).
    from porotpu.utils.roofline import op_stream_time, stream_peak

    A = problem.A_dev
    spmv_s = op_stream_time(A, b)
    nnz_padded = sum(int(e.nnz_padded) for e in A.blocks.values())
    itemsize = np.dtype(np.float32 if dtype == jnp.float32 else np.float64).itemsize
    peak_gbs = stream_peak(dtype, mb=256)
    nvec = int(b.shape[0])
    spmv_gbs = (nnz_padded + 2 * nvec) * itemsize / spmv_s / 1e9
    log(
        f"solve [{dtype_name}]: {solve_s:.4f}s ({iters} iters), "
        f"SpMV: {spmv_s * 1e3:.3f}ms, padded nnz/s={nnz_padded / spmv_s:.3e}"
    )
    log(
        f"roofline [{dtype_name}]: SpMV {spmv_gbs:.1f} GB/s = "
        f"{100 * spmv_gbs / peak_gbs:.1f}% of measured stream peak "
        f"{peak_gbs:.1f} GB/s (chained triad, 256 MB arrays)"
    )

    return {
        "metric": "swelling3d_step_solve_time",
        "value": round(solve_s, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_SOLVE_S / solve_s, 3),
        "dtype": dtype_name,
        **({"pc_dtype": pc_dtype} if pc_dtype else {}),
        "dofs": int(problem.W.num_dofs),
        "iters": iters,
    }


def main():
    N = int(os.environ.get("BENCH_N", "13"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")

    # the ONE-json-line stdout contract: the library's rank-0 banner
    # prints (problem dofs, solver-created lines) go to stderr with the
    # rest of the diagnostics; only the headline JSON touches real stdout
    real_stdout = sys.stdout
    with contextlib.redirect_stdout(sys.stderr):
        _main_body(dtype_name, N, real_stdout)


def _main_body(dtype_name, N, real_stdout):
    headline = run_bench(dtype_name, N, strict=True)

    # print + flush the validated headline BEFORE any secondary pass: an
    # uncatchable failure there (OOM, wedged TPU tunnel) must not lose the
    # one-JSON-line stdout contract
    print(
        json.dumps(
            {
                "metric": headline["metric"],
                "value": headline["value"],
                "unit": headline["unit"],
                "vs_baseline": headline["vs_baseline"],
            }
        ),
        file=real_stdout,
        flush=True,
    )

    # like-for-like f64-ACCURACY datapoint (the reference pipeline is
    # all-f64): f64 outer FGMRES + true-residual guard with the PC
    # payloads at f32 (CastPC mixed precision) — logged to stderr so the
    # headline stays the tuned f32 point.  BENCH_F64_PC=float64 forces the
    # all-f64 point instead; BENCH_F64=0 skips.
    if dtype_name == "float32" and os.environ.get("BENCH_F64", "1") != "0":
        f64_n = int(os.environ.get("BENCH_F64_N", str(N)))
        f64_pc = os.environ.get("BENCH_F64_PC", "float32")
        try:
            rec = run_bench("float64", f64_n, strict=False, pc_dtype=f64_pc)
            log("f64 datapoint: " + json.dumps(rec))
        except Exception as e:  # noqa: BLE001 — secondary point must not kill the bench
            log(f"f64 datapoint: FAILED ({type(e).__name__}: {e})")
        if os.environ.get("BENCH_IR", "1") != "0":
            try:
                rec = run_bench_ir(f64_n)
                log("f64-ir datapoint: " + json.dumps(rec))
            except Exception as e:  # noqa: BLE001
                log(f"f64-ir datapoint: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
