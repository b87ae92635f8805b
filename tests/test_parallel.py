"""Sharded-solve tests on the virtual 8-device CPU mesh.

The multi-device testing the reference lacks (SURVEY.md §4): the sharded
FGMRES + block-PC solve must produce the same solution as the
single-device solve.  Problems are built with ``pad multiple = 8`` so
every per-field operator row count divides the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from porotpu.models import benchmarks
from porotpu.ops.sparse import ELL
from porotpu.parallel import shard_ell, shard_operator, shard_vector, solver_mesh


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_spmv_matches():
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    A = (sp.random(320, 320, 0.05, random_state=rng) + sp.eye(320)).tocsr()
    E = ELL.from_csr(A, jnp.float64)
    mesh = solver_mesh(8)
    Es = shard_ell(E, mesh)
    x = jnp.asarray(rng.normal(size=320))
    y1 = np.asarray(E.matvec(x))
    y2 = np.asarray(jax.jit(lambda ee, xx: ee.matvec(xx))(Es, x))
    assert np.allclose(y1, y2, atol=1e-12)


def _sharded_vs_single(overrides, N=6, builder=benchmarks.swelling, n_hosts=None):
    # single-device (unpadded)
    prob1 = builder(Nelements=N, overrides=dict(overrides))
    prob1.create_solver()
    prob1.first_timestep = False
    t = prob1.t0 + prob1.parameters["dt"]
    b1 = prob1.get_rhs(t)
    res1 = prob1._jit_solve(prob1.A_dev, prob1.pc, b1, jnp.zeros_like(b1))

    # padded + sharded over 8 devices
    ov = dict(overrides)
    ov["pad multiple"] = 8
    prob2 = builder(Nelements=N, overrides=ov)
    prob2.create_solver()
    prob2.first_timestep = False
    b2 = prob2.get_rhs(t)
    mesh = solver_mesh(8, n_hosts=n_hosts)
    res2 = prob2._jit_solve(
        shard_operator(prob2.A_dev, mesh),
        shard_operator(prob2.pc, mesh),
        shard_vector(b2, mesh),
        shard_vector(jnp.zeros_like(b2), mesh),
    )
    x1 = np.asarray(res1.x)[prob1.pad_index]
    x2 = np.asarray(res2.x)[prob2.pad_index]
    return res1, res2, x1, x2


def test_sharded_full_solve_matches_single_device():
    res1, res2, x1, x2 = _sharded_vs_single(
        {
            "pc type": "diagonal",
            "inner pc type": "hypre",
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
        }
    )
    assert bool(res2.converged)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-8


def test_sharded_3way_solve():
    res1, res2, x1, x2 = _sharded_vs_single(
        {
            "pc type": "diagonal 3-way",
            "inner pc type": "lu",
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
            "solver maxiter": 400,
        },
        N=4,
    )
    assert bool(res2.converged)
    assert np.all(np.isfinite(x2))
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-6


def test_sharded_solve_on_2d_host_mesh_matches():
    """Multi-host (DCN) layout: rows sharded host-major over a 2-D
    ("hosts", "chips") mesh — each host owns a contiguous lattice slab, so
    only slab-boundary halos cross DCN (the MPI rank=(node,local) layout
    of the reference's mpirun runs, SURVEY.md §2.5).  The solver carries
    no axis names, so correctness on the 2-D mesh certifies the whole
    multi-host path."""
    res1, res2, x1, x2 = _sharded_vs_single(
        {
            "pc type": "diagonal",
            "inner pc type": "hypre",
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
        },
        n_hosts=2,
    )
    assert bool(res2.converged)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-8


def _permute_pairs(hlo: str):
    """All (source, target) pairs of every collective-permute in the HLO."""
    import re

    pairs = []
    for m in re.finditer(r"source_target_pairs=\{(\{[^=]*?\})\}", hlo):
        for s, t in re.findall(r"\{(\d+),(\d+)\}", m.group(1)):
            pairs.append((int(s), int(t)))
    return pairs


def test_sharded_dia_spmv_2d_host_mesh_gather_free():
    """The banded SpMV must stay gather-free on the ("hosts","chips")
    mesh, and every collective-permute must be a NEIGHBOR exchange
    (|source-target| == 1 on the flattened host-major device order) — so
    the host axis is crossed only at the one slab boundary between
    devices 3 and 4 (the DCN-minimal layout, SURVEY.md §2.5)."""
    import scipy.sparse as sp
    from porotpu.ops.dia import DIA

    n = 1600
    rng = np.random.default_rng(5)
    offs = [-41, -1, 0, 1, 41]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float64)
    mesh = solver_mesh(8, n_hosts=2)
    assert mesh.axis_names == ("hosts", "chips")
    Ds = shard_ell(D, mesh)
    x = shard_vector(jnp.asarray(rng.normal(size=n)), mesh)
    f = jax.jit(lambda d, v: d.matvec(v))
    hlo = f.lower(Ds, x).compile().as_text()
    assert hlo.count("all-gather") == 0
    assert hlo.count("collective-permute") > 0
    pairs = _permute_pairs(hlo)
    assert pairs, "expected parsable source_target_pairs"
    non_neighbor = [p for p in pairs if abs(p[0] - p[1]) != 1]
    assert not non_neighbor, f"non-neighbor halo permutes: {non_neighbor}"
    host_crossing = [p for p in pairs if (p[0] < 4) != (p[1] < 4)]
    assert all(set(p) == {3, 4} for p in host_crossing)
    y = np.asarray(f(Ds, x))
    assert np.allclose(y, A @ np.asarray(x), atol=1e-10)


def test_sharded_dia_halo_is_aggregated():
    """Round-4 regression: one aggregated boundary-slab exchange per DIA
    product, NOT one permute per stored diagonal.  A 9-diagonal matvec and
    rmatvec must each compile to exactly 2 collective-permutes (left +
    right slab), matching PETSc MatMult's single VecScatter per product
    (reference lib/AAR.py:135)."""
    import re

    import scipy.sparse as sp
    from porotpu.ops.dia import DIA

    n = 1600
    rng = np.random.default_rng(7)
    offs = [-83, -42, -40, -1, 0, 1, 40, 42, 81]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float64)
    mesh = solver_mesh(8)
    Ds = shard_ell(D, mesh)
    assert Ds.dist is not None and Ds.dist[0] == "halo"
    x = shard_vector(jnp.asarray(rng.normal(size=n)), mesh)
    for apply_fn, ref in (
        (lambda d, v: d.matvec(v), A @ np.asarray(x)),
        (lambda d, v: d.rmatvec(v), A.T @ np.asarray(x)),
    ):
        f = jax.jit(apply_fn)
        hlo = f.lower(Ds, x).compile().as_text()
        n_cp = len(re.findall(r"= \S+ collective-permute(?:-start)?\(", hlo))
        assert n_cp == 2, f"expected 2 aggregated halo permutes, got {n_cp}"
        assert hlo.count("all-gather") == 0
        assert np.allclose(np.asarray(f(Ds, x)), ref, atol=1e-10)


def test_sharded_aar_solve_matches_single_device():
    """The AAR solver's distributed Gram least-squares path (solvers/
    anderson.py:gram_ls_alpha over sharded rows) compiled + executed on
    the 8-device mesh against the single-device result."""
    res1, res2, x1, x2 = _sharded_vs_single(
        {
            "pc type": "diagonal",
            "inner pc type": "lu",
            "solver type": "aar",
            "solver rtol": 1e-9,
            "solver atol": 1e-12,
            "solver maxiter": 300,
        },
        N=4,
    )
    assert bool(res2.converged)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-6


def test_sharded_mixed_precision_solve():
    """Mixed precision (f64 outer FGMRES + f32 PC payloads, CastPC) on the
    8-device mesh: converges to f64 accuracy on the true residual and
    matches the all-f64 single-device solution."""
    res1, res2, x1, x2 = _sharded_vs_single(
        {
            "pc type": "diagonal",
            "inner pc type": "hypre",
            "solver rtol": 1e-8,
            "solver atol": 1e-12,
        },
        N=6,
    )
    ov = {
        "pc type": "diagonal",
        "inner pc type": "hypre",
        "solver rtol": 1e-8,
        "solver atol": 1e-12,
        "pc dtype": "float32",
        "pad multiple": 8,
    }
    prob = benchmarks.swelling(Nelements=6, overrides=ov)
    prob.create_solver()
    prob.first_timestep = False
    from porotpu.precond.block import CastPC

    assert isinstance(prob.pc, CastPC)
    t = prob.t0 + prob.parameters["dt"]
    b = prob.get_rhs(t)
    mesh = solver_mesh(8)
    res = prob._jit_solve(
        shard_operator(prob.A_dev, mesh),
        shard_operator(prob.pc, mesh),
        shard_vector(b, mesh),
        shard_vector(jnp.zeros_like(b), mesh),
    )
    assert bool(res.converged)
    assert res.x.dtype == jnp.float64
    xm = np.asarray(res.x)[prob.pad_index]
    assert np.linalg.norm(x1 - xm) / np.linalg.norm(x1) < 1e-7
    # f64 accuracy certified on the TRUE residual, not the Krylov estimate
    r = np.asarray(b) - np.asarray(prob.A_dev.matvec(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7


def test_sharded_real_amg_hierarchy_matches_single_device():
    """Regression for the round-2 multichip crash: shard a REAL multi-level
    AMG hierarchy whose coarse-level sizes do NOT divide the device mesh
    (they follow the aggregation, not the padding) and match the
    single-device solve.  Previously shard_vector crashed on the coarse
    dinv; coarse levels are now replicated (coarse-grid agglomeration)."""
    ov = {
        "pc type": "diagonal",
        "inner pc type": "hypre",
        "solver rtol": 1e-8,
        "solver atol": 1e-12,
        "amg coarse size": 40,  # force >= 2 levels on a small problem
    }
    res1, res2, x1, x2 = _sharded_vs_single(dict(ov), N=8)

    # the sharded problem must actually contain a deep hierarchy with a
    # mesh-indivisible level — otherwise this test isn't testing the path
    prob = benchmarks.swelling(Nelements=8, overrides={**ov, "pad multiple": 8})
    prob.create_solver()
    amg = prob.pc.solve_s.payload["amg"]
    assert len(amg.levels) >= 2
    assert any(l.dinv.shape[0] % 8 for l in amg.levels[1:]) or (
        amg.coarse_inv.shape[0] % 8
    )

    assert bool(res2.converged)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-8


def test_sharded_full_solve_hlo_no_large_all_gathers():
    """End-to-end HLO audit of the WHOLE sharded solve (outer FGMRES +
    block PC + real AMG hierarchy): no full-vector all-gathers from the
    SpMV/smoothing path.  The only all-gathers allowed are (a) the small
    P1->P2 embedding scatters/gathers (bounded by the pressure-space
    size) and (b) the per-iteration field-concatenation reshuffles
    (bounded by one field vector, ~n floats — the concatenated vector's
    uniform shards cannot align with all three field boundaries).  The
    DIA scan path's traced slice starts used to all-gather the source
    vector 136x per program (ops/dia.py:UNROLL_MAX note); this pins the
    gather-free compilation down at the full-solve level, extending
    test_sharded_dia_spmv_uses_halo_exchange."""
    ov = {
        "pc type": "diagonal",
        "inner pc type": "hypre",
        "solver rtol": 1e-8,
        "solver atol": 1e-12,
        "solver maxiter": 20,
        "amg coarse size": 40,  # real multi-level hierarchy
        "pad multiple": 8,
    }
    prob = benchmarks.swelling(Nelements=8, overrides=ov)
    prob.create_solver()
    prob.first_timestep = False
    t = prob.t0 + prob.parameters["dt"]
    b = prob.get_rhs(t)
    mesh = solver_mesh(8)
    args = (
        shard_operator(prob.A_dev, mesh),
        shard_operator(prob.pc, mesh),
        shard_vector(b, mesh),
        shard_vector(jnp.zeros_like(b), mesh),
    )
    hlo = prob._jit_solve.lower(*args).compile().as_text()
    import re

    n_total = b.shape[0]
    ns = prob.padded_sizes[0]
    large = []
    for line in hlo.splitlines():
        if not re.search(r"= \S+ all-gather(-start)?\(", line):
            continue  # only all-gather ops themselves, not their consumers
        m = re.search(r"= f\d+\[(\d+)[\],]", line)
        if m and int(m.group(1)) > ns:
            large.append(line.strip()[:160])
    assert not large, "system-scale all-gathers in sharded solve:\n" + "\n".join(
        large[:8]
    )
    assert hlo.count("collective-permute") > 0, "expected halo exchanges"


def test_padded_unsharded_matches_unpadded():
    # pad multiple > 1 must not change the solution even without sharding
    ov = {"pc type": "undrained", "inner pc type": "lu",
          "solver rtol": 1e-10, "solver atol": 1e-12}
    prob1 = benchmarks.footing(Nelements=4, overrides=dict(ov))
    iters1 = prob1.solve()
    ov["pad multiple"] = 8
    prob2 = benchmarks.footing(Nelements=4, overrides=dict(ov))
    iters2 = prob2.solve()
    x1 = prob1.unpadded_solution()
    x2 = prob2.unpadded_solution()
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-8
    assert iters1 == iters2


def test_sharded_dia_spmv_uses_halo_exchange():
    """The production (banded DIA) SpMV sharded over the row mesh must
    compile to neighbor halo exchanges (collective-permute) with ZERO
    full-vector all-gathers — the TPU-native equivalent of PETSc MatMult's
    VecScatter halo pipeline (reference lib/AAR.py:135; SURVEY §2.5/§7.5).
    GSPMD derives the halo pattern from DIA's shifted static slices."""
    import scipy.sparse as sp
    from porotpu.ops.dia import DIA

    n = 1600
    rng = np.random.default_rng(3)
    offs = [-42, -40, -1, 0, 1, 40, 42]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float64)
    mesh = solver_mesh(8)
    Ds = shard_ell(D, mesh)
    x = shard_vector(jnp.asarray(rng.normal(size=n)), mesh)
    f = jax.jit(lambda d, v: d.matvec(v))
    hlo = f.lower(Ds, x).compile().as_text()
    assert hlo.count("all-gather") == 0, "sharded DIA SpMV must not all-gather"
    assert hlo.count("collective-permute") > 0, "expected halo exchanges"
    y = np.asarray(f(Ds, x))
    assert np.allclose(y, A @ np.asarray(x), atol=1e-10)


def test_halo_matvec_interior_independent_of_permutes():
    """Comm/compute overlap invariant (SURVEY §2.5 north-star; the PETSc
    VecScatterBegin/End-around-local-multiply pattern, lib/AAR.py:135):
    the interior sweep of the halo matvec must have NO data dependence on
    either collective-permute, so XLA's latency-hiding scheduler can run
    it while the slabs are in flight.

    Asserted on the jaxpr dependence graph (backend-independent — the CPU
    test backend compiles synchronous collective-permutes, so the
    TPU-scheduled start/done bracketing cannot be observed here): every
    arithmetic consumer downstream of a ppermute output must be
    boundary-sized (O(halo width)), never the nloc-sized interior sweep.
    The pre-overlap sequential body fails this: its permutes fed the full
    [left | local | right] concatenation that every multiply consumed."""
    import scipy.sparse as sp
    from porotpu.ops.dia import DIA

    n = 1600
    rng = np.random.default_rng(5)
    offs = [-8, -5, -1, 0, 1, 5, 8]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float64)
    mesh = solver_mesh(8)
    Ds = shard_ell(D, mesh)
    assert Ds.dist is not None and Ds.dist[0] == "halo"
    x = shard_vector(jnp.asarray(rng.normal(size=n)), mesh)
    jaxpr = jax.make_jaxpr(lambda d, v: d.matvec(v))(Ds, x)

    nloc = n // 8
    hl, hr = 8, 8
    bound = 3 * (hl + hr)  # boundary windows are O(halo), far below nloc

    def inner_jaxprs(eqn):
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for w in vs:
                if hasattr(w, "eqns"):  # Jaxpr
                    yield w
                elif hasattr(w, "jaxpr"):  # ClosedJaxpr
                    yield w.jaxpr

    def walk(jx, found):
        """Forward cone of ppermute outvars within one jaxpr; assert every
        arithmetic eqn in the cone stays boundary-sized."""
        cone = set()
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim == "ppermute":
                found[0] = True
                cone.update(map(str, eqn.outvars))
                continue
            for sub in inner_jaxprs(eqn):  # shard_map / pjit / scan bodies
                walk(sub, found)
            ins = [str(v) for v in eqn.invars if hasattr(v, "aval")]
            if any(i in cone for i in ins):
                cone.update(map(str, eqn.outvars))
                if prim in ("mul", "add", "sub", "dot_general"):
                    size = max(
                        int(np.prod(v.aval.shape)) for v in eqn.outvars
                    )
                    assert size <= bound, (
                        f"{prim} of size {size} depends on the halo "
                        f"permutes — interior sweep is not independent"
                    )

    found = [False]
    walk(jaxpr.jaxpr, found)
    assert found[0], "expected ppermute eqns in the halo matvec jaxpr"
    # and the split body still computes the right thing
    f = jax.jit(lambda d, v: d.matvec(v))
    y = np.asarray(f(Ds, x))
    assert np.allclose(y, A @ np.asarray(x), atol=1e-10)


def test_halo_matvec_pallas_interior_kernel(monkeypatch):
    """Pallas under shard_map (VERDICT r4 weak #1): with 128-aligned
    local shards and f32 data, the halo matvec's interior runs through
    the streaming kernel (PORO_PALLAS_INTERPRET=1 dispatches it in
    interpreter mode so the CPU mesh exercises the production path).
    Result must be bit-for-bit the sharded reference, with the 2-permute
    aggregation intact."""
    import re

    import scipy.sparse as sp
    from porotpu.ops import pallas_dia
    from porotpu.ops.dia import DIA

    if not pallas_dia.HAVE_PALLAS:
        import pytest

        pytest.skip("pallas unavailable")
    n = 8 * 256  # nloc = 256 -> 128-aligned shards
    rng = np.random.default_rng(11)
    offs = [-130, -40, -1, 0, 1, 40, 131]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float32)
    mesh = solver_mesh(8)
    Ds = shard_ell(D, mesh)
    assert Ds.dist is not None and Ds.dist[0] == "halo"
    x = shard_vector(jnp.asarray(rng.normal(size=n), dtype=jnp.float32), mesh)
    monkeypatch.setenv("PORO_PALLAS_INTERPRET", "1")
    assert pallas_dia.enabled()
    f = jax.jit(lambda d, v: d.matvec(v))
    hlo = f.lower(Ds, x).compile().as_text()
    n_cp = len(re.findall(r"= \S+ collective-permute(?:-start)?\(", hlo))
    assert n_cp == 2, f"expected 2 aggregated halo permutes, got {n_cp}"
    y = np.asarray(f(Ds, x))
    ref = A @ np.asarray(x, dtype=np.float64)
    assert np.allclose(y, ref, atol=1e-3 * np.abs(ref).max())


def test_embedded_halo_matvec_cross_shard_scatter():
    """Regression: the embedded (col_emb) halo matvec must DROP coarse
    dofs owned by other shards — negative traced indices WRAP in jax
    scatters, which silently corrupted boundary entries (found via a
    Transposed fluid-pressure coupling block, round 4)."""
    import scipy.sparse as sp
    from porotpu.ops.dia import DIA, Transposed

    rng = np.random.default_rng(11)
    n, nc = 584, 88
    emb = np.sort(rng.choice(n, size=nc, replace=False)).astype(np.int64)
    ii = np.arange(n)
    jj = np.clip(np.searchsorted(emb, ii), 0, nc - 1)
    M = sp.csr_matrix((rng.normal(size=n), (ii, jj)), shape=(n, nc))
    M = M + sp.csr_matrix(
        (rng.normal(size=n - 7), (ii[:-7], np.clip(jj[:-7] + 1, 0, nc - 1))),
        shape=(n, nc),
    )
    D = DIA.from_csr(M, dtype=jnp.float64, col_emb=emb)
    mesh = solver_mesh(8)
    Ds = shard_ell(D, mesh)
    assert Ds.dist[0] == "halo"
    xc = jnp.asarray(rng.normal(size=nc))
    y = np.asarray(jax.jit(lambda d, v: d.matvec(v))(Ds, xc))
    assert np.allclose(y, M @ np.asarray(xc), atol=1e-12)
    # and through the Transposed wrapper (A^T with A = M^T), as used by
    # the fluid-pressure Apf coupling block
    T = Transposed(Ds)
    z = np.asarray(jax.jit(lambda d, v: d.rmatvec(v))(T, xc))
    assert np.allclose(z, M @ np.asarray(xc), atol=1e-12)
