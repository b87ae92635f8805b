"""Knob sweep for SA-AMG on the swelling solid block (h-robustness leak).

Builds P_ss once per N, then tries amg_setup variants and reports the
V-cycle contraction factor rho for each.  f64 throughout.

Usage: PORO_PLATFORM=cpu python tools/amg_tune_solid.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def get_block(N, block="s"):
    from porotpu.models import benchmarks

    problem = benchmarks.swelling(
        Nelements=N,
        overrides={"pc type": "diagonal", "inner pc type": "hypre"},
        dtype=jnp.float64,
    )
    A, P, Pd, (bc_dofs, bc_vals) = problem._bc_applied_operators()
    ns_p, nf_p, np_p = problem.padded_sizes
    sl = {"s": slice(0, ns_p), "f": slice(ns_p, ns_p + nf_p)}
    P_blk = P[sl[block], sl[block]].tocsr()
    dim = problem.mesh.dim
    W = problem.W
    nb = problem.ns if block == "s" else problem.nf
    off = 0 if block == "s" else ns_p
    B = problem._rigid_modes_padded(W.space(block), nb, ns_p, off, bc_dofs)
    xyz = problem._padded_coords(W.space(block), (ns_p - nb) // dim)
    return P_blk, B, xyz, dim


def rho_of(amg, Aop, n, cycles=10):
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=n))
    x = jnp.zeros_like(b)
    rs = [float(jnp.linalg.norm(b))]
    for _ in range(cycles):
        x = x + amg(b - Aop.matvec(x))
        rs.append(float(jnp.linalg.norm(b - Aop.matvec(x))))
    rho_avg = (rs[-1] / rs[0]) ** (1.0 / cycles)
    rho_last = rs[-1] / rs[-2]
    return rho_avg, rho_last


def main():
    from porotpu.precond.amg import amg_setup

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    P_blk, B, xyz, dim = get_block(N)
    print(f"N={N} solid block n={P_blk.shape[0]} nnz={P_blk.nnz}")

    variants = [
        ("baseline (1+1, box3)", dict()),
        ("box2 + 2+2", dict(box_factor=2.0, presmooth=2, postsmooth=2)),
        ("box2 + 2+2 + smooth2", dict(box_factor=2.0, presmooth=2,
                                      postsmooth=2, smooth_degree=2)),
    ]
    for name, kw in variants:
        kw = dict(kw)
        use_coords = not kw.pop("no_coords", False)
        t0 = time.perf_counter()
        amg = amg_setup(
            P_blk,
            dofs_per_node=dim,
            B=B,
            coords=xyz if use_coords else None,
            dtype=jnp.float64,
            **kw,
        )
        ts = time.perf_counter() - t0
        Aop = amg.levels[0].A if amg.levels else None
        if Aop is None:
            print(f"  {name}: NO LEVELS (n <= coarse_size)")
            continue
        levels = [lvl.A.shape[0] for lvl in amg.levels] + [amg.coarse_inv.shape[0]]
        ra, rl = rho_of(amg, Aop, P_blk.shape[0])
        print(
            f"  {name}: rho_avg={ra:.3f} rho_last={rl:.3f} levels={levels} "
            f"setup={ts:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
