"""Per-block AMG quality probe for the h-robustness investigation.

For each mesh size N, assembles the swelling 2-way preconditioner blocks
(P_ss solid, P_ff fluid, selfp Schur S — the three operators the inexact
configuration AMG-solves, petsc-options-inexact + reference
petsc-options-inexact:16-24) and measures the V-cycle error-contraction
factor of each block's AMG hierarchy directly:

    rho = (|r_k| / |r_0|)^(1/k)   after k cycles of  x += AMG(b - A x)

An h-robust AMG keeps rho bounded away from 1 as N grows; a degrading
block is the robustness leak feeding outer-iteration growth (VERDICT
round-2, Missing #2).

Usage: PORO_PLATFORM=cpu python tools/amg_probe.py [N ...] [--knobs k=v ...]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def probe(N, overrides, cycles=8, dtype=jnp.float64):
    from porotpu.models import benchmarks
    from porotpu.precond.schur import selfp_schur

    t0 = time.perf_counter()
    problem = benchmarks.swelling(
        Nelements=N,
        overrides={"pc type": "diagonal", "inner pc type": "hypre", **overrides},
        dtype=dtype,
    )
    # build host operators only (no device PC): replicate _build_operators'
    # block extraction
    A, P, Pd, (bc_dofs, bc_vals) = problem._bc_applied_operators()
    ns_p, nf_p, np_p = problem.padded_sizes
    sl = {
        "s": slice(0, ns_p),
        "f": slice(ns_p, ns_p + nf_p),
        "p": slice(ns_p + nf_p, problem.n_pad),
    }
    P_ss = P[sl["s"], sl["s"]].tocsr()
    P_ff = P[sl["f"], sl["f"]].tocsr()
    P_pp = P[sl["p"], sl["p"]].tocsr()
    S = selfp_schur(
        P_ff, P[sl["f"], sl["p"]].tocsr(), P[sl["p"], sl["f"]].tocsr(), P_pp
    )
    dim = problem.mesh.dim
    W = problem.W
    B_s = problem._rigid_modes_padded(W.space("s"), problem.ns, ns_p, 0, bc_dofs)
    B_f = problem._rigid_modes_padded(
        W.space("f"), problem.nf, nf_p, ns_p, bc_dofs
    )
    xyz_s = problem._padded_coords(W.space("s"), (ns_p - problem.ns) // dim)
    xyz_f = problem._padded_coords(W.space("f"), (nf_p - problem.nf) // dim)
    xyz_p = problem._padded_coords(W.space("p"), np_p - problem.npp)
    print(f"N={N} setup {time.perf_counter()-t0:.1f}s "
          f"ns={ns_p} nf={nf_p} np={np_p}", file=sys.stderr)

    from porotpu.precond.inner import InnerConfig, build_inner_solver

    results = {}
    for name, Ablk, kw in (
        ("s", P_ss, dict(dofs_per_node=dim, near_nullspace=B_s, coords=xyz_s)),
        ("f", P_ff, dict(dofs_per_node=dim, near_nullspace=B_f, coords=xyz_f)),
        ("S", S, dict(coords=xyz_p)),
    ):
        cfg = problem._inner_cfg("s")  # just for the AMG knobs
        cfg = InnerConfig(
            method="amg",
            amg_theta=cfg.amg_theta,
            amg_coarse_size=cfg.amg_coarse_size,
            amg_presmooth=cfg.amg_presmooth,
            amg_postsmooth=cfg.amg_postsmooth,
        )
        t0 = time.perf_counter()
        solver = build_inner_solver(Ablk, cfg, dtype=dtype, **kw)
        t_setup = time.perf_counter() - t0
        amg = solver.payload["amg"]
        Aop = solver.payload["A"]
        levels = [lvl.A.shape[0] for lvl in amg.levels] + [
            amg.coarse_inv.shape[0]
        ]
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.normal(size=Ablk.shape[0]), dtype=dtype)
        x = jnp.zeros_like(b)
        r0 = float(jnp.linalg.norm(b))
        rs = [r0]
        for k in range(cycles):
            x = x + amg(b - Aop.matvec(x))
            rs.append(float(jnp.linalg.norm(b - Aop.matvec(x))))
        # asymptotic contraction: last-step ratio (early steps flatter)
        rho_avg = (rs[-1] / rs[0]) ** (1.0 / cycles)
        rho_last = rs[-1] / rs[-2] if rs[-2] > 0 else float("nan")
        results[name] = (rho_avg, rho_last, levels, t_setup)
        print(
            f"  block {name}: rho_avg={rho_avg:.3f} rho_last={rho_last:.3f} "
            f"levels={levels} setup={t_setup:.1f}s",
            flush=True,
        )
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("Ns", nargs="*", type=int, default=[10, 20, 40])
    ap.add_argument("--knob", action="append", default=[],
                    help="parameter override key=value (e.g. 'amg presmooth=2')")
    ap.add_argument("--cycles", type=int, default=8)
    args = ap.parse_args()
    overrides = {}
    for kv in args.knob:
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        overrides[k] = v
    for N in args.Ns or [10, 20, 40]:
        probe(N, overrides, cycles=args.cycles)
