#!/usr/bin/env python3
"""Pure-elasticity sanity benchmark (single elliptic block + AMG).

TPU-native counterpart of the reference solid.py: assembles the solid
block a_s on a cube, solves with CG + smoothed-aggregation AMG (the
BoomerAMG stand-in) or dense LU per the options file, and reports
iterations and wall time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from porotpu.models.subsystems import solid_problem
from porotpu.ops import device_matrix
from porotpu.precond.amg import rigid_body_modes
from porotpu.precond.inner import InnerConfig, build_inner_solver
from porotpu.solvers import cg
from porotpu.utils.parser import Parser
from porotpu.utils.printing import parprint


def main():
    parser = Parser()
    N = parser.options.N or 10
    refinements = parser.options.refinements or 0
    dtype = jnp.float64 if parser.options.dtype == "float64" else jnp.float32

    tt = time.perf_counter()
    A, b, V, mesh = solid_problem(N, refinements)
    parprint("Dofs = {}".format(A.shape[0]))
    parprint("Assembled in {}s".format(time.perf_counter() - tt))

    odb = parser.options_dict.get("options db")
    cfg = odb.inner_config("s") if odb else None
    if cfg is None:
        cfg = InnerConfig(method="amg")

    tt = time.perf_counter()
    B = rigid_body_modes(V.node_coords)
    M = build_inner_solver(
        A, cfg, dofs_per_node=3, near_nullspace=B, coords=V.node_coords, dtype=dtype
    )
    E = device_matrix(A, dtype)
    # operators passed as pytree args (not closure constants) to avoid
    # baking the sparse data into the executable
    solve = jax.jit(
        lambda Eop, Mop, bb: cg(Eop.matvec, bb, M=Mop, rtol=1e-8, atol=0.0, maxiter=500)
    )
    res = solve(E, M, jnp.asarray(b, dtype=dtype))
    res.x.block_until_ready()
    parprint(
        "Solved in {} iterations in {}s".format(
            int(res.iters), time.perf_counter() - tt
        )
    )
    rnorm = np.linalg.norm(A @ np.asarray(res.x, dtype=np.float64) - b)
    parprint("Final residual = {:.3e} (|b| = {:.3e})".format(rnorm, np.linalg.norm(b)))


if __name__ == "__main__":
    main()
