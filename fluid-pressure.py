#!/usr/bin/env python3
"""2-field fluid/pressure subsystem benchmark (the "fp block" in isolation).

TPU-native counterpart of the reference fluid-pressure.py: mixed P2/P1
system solved by FGMRES with a Schur-fieldsplit preconditioner
(lower factorization, selfp Schur), reporting iterations and wall time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from porotpu.models.subsystems import fluid_pressure_problem
from porotpu.fem.dofmap import vertex_embedding
from porotpu.ops import FieldMatrix, device_matrix
from porotpu.precond.inner import InnerConfig
from porotpu.precond.schur import build_schur_fieldsplit
from porotpu.solvers import fgmres
from porotpu.utils.parser import Parser
from porotpu.utils.printing import parprint


def main():
    parser = Parser()
    N = parser.options.N or 10
    refinements = parser.options.refinements or 0
    dtype = jnp.float64 if parser.options.dtype == "float64" else jnp.float32

    tt = time.perf_counter()
    blocks, b, W, mesh = fluid_pressure_problem(N, refinements)
    parprint("Dofs = {}".format(b.shape[0]))
    parprint("Assembled in {}s".format(time.perf_counter() - tt))

    odb = parser.options_dict.get("options db")
    cfg_f = (odb.inner_config("fp_fieldsplit_0") if odb else None) or InnerConfig(
        method="cg+amg", iters=10
    )
    cfg_S = (odb.inner_config("fp_fieldsplit_1") if odb else None) or InnerConfig(
        method="lu"
    )

    tt = time.perf_counter()
    Vf, Qp = W.space("f"), W.space("p")
    emb_pf = vertex_embedding(Qp, Vf)
    M = build_schur_fieldsplit(
        blocks["f", "f"],
        blocks["f", "p"],
        blocks["p", "f"],
        blocks["p", "p"],
        cfg_f,
        cfg_S,
        dofs_per_node_f=3,
        coords_f=Vf.node_coords,
        coords_p=Qp.node_coords,
        row_emb_pf=emb_pf,
        dtype=dtype,
    )
    Amono = sp.bmat(
        [
            [blocks["f", "f"], blocks["f", "p"]],
            [blocks["p", "f"], blocks["p", "p"]],
        ],
        format="csr",
    )
    embs = {
        ("f", "p"): dict(col_emb=emb_pf),
        ("p", "f"): dict(row_emb=emb_pf),
    }
    E = FieldMatrix(
        {
            k: device_matrix(v.tocsr(), dtype, **embs.get(k, {}))
            for k, v in blocks.items()
            if v.nnz
        },
        {"f": Vf.num_dofs, "p": Qp.num_dofs},
    )
    solve = jax.jit(
        lambda Eop, Mop, bb: fgmres(
            Eop.matvec, bb, M=Mop, rtol=1e-8, atol=0.0, maxiter=300
        )
    )
    res = solve(E, M, jnp.asarray(b, dtype=dtype))
    res.x.block_until_ready()
    parprint(
        "Solved in {} iterations in {}s".format(
            int(res.iters), time.perf_counter() - tt
        )
    )
    rnorm = np.linalg.norm(Amono @ np.asarray(res.x, dtype=np.float64) - b)
    parprint("Final residual = {:.3e} (|b| = {:.3e})".format(rnorm, np.linalg.norm(b)))


if __name__ == "__main__":
    main()
