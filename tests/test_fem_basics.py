"""Unit tests for quadrature, elements, meshes, and assembly kernels.

Oracle strategy (SURVEY.md §4): analytic identities (partition of unity,
rigid-body nullspaces, exact integrals of polynomials) and scipy direct
solves of manufactured problems.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from porotpu.fem import assemble, elements, quadrature
from porotpu.fem.dofmap import FunctionSpace, MixedSpace
from porotpu.fem.mesh import (
    generate_cube,
    generate_footing_square,
    generate_square,
    refine_uniform,
)


def _monomial_integral_tri(px, py):
    # ∫_T x^p y^q over reference triangle = p! q! / (p+q+2)!
    from math import factorial

    return factorial(px) * factorial(py) / factorial(px + py + 2)


def _monomial_integral_tet(p, q, r):
    from math import factorial

    return factorial(p) * factorial(q) * factorial(r) / factorial(p + q + r + 3)


@pytest.mark.parametrize("deg", [2, 4])
def test_quadrature_tri_exactness(deg):
    pts, wts = quadrature.simplex_rule(2, deg)
    for p in range(deg + 1):
        for q in range(deg + 1 - p):
            val = np.sum(wts * pts[:, 0] ** p * pts[:, 1] ** q)
            assert np.isclose(val, _monomial_integral_tri(p, q), atol=1e-12)


@pytest.mark.parametrize("deg", [2, 4])
def test_quadrature_tet_exactness(deg):
    pts, wts = quadrature.simplex_rule(3, deg)
    for p in range(deg + 1):
        for q in range(deg + 1 - p):
            for r in range(deg + 1 - p - q):
                val = np.sum(
                    wts * pts[:, 0] ** p * pts[:, 1] ** q * pts[:, 2] ** r
                )
                assert np.isclose(val, _monomial_integral_tet(p, q, r), atol=1e-12)


@pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_partition_of_unity(dim, deg):
    pts, _ = quadrature.simplex_rule(dim, 4)
    phi, dphi = elements.tabulate(dim, deg, pts)
    assert np.allclose(phi.sum(axis=1), 1.0)
    assert np.allclose(dphi.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("dim,deg", [(2, 2), (3, 2)])
def test_lagrange_property(dim, deg):
    # basis i equals 1 at node i, 0 at others
    if dim == 2:
        nodes = np.array(
            [[0, 0], [1, 0], [0, 1], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
        )
    else:
        verts = np.vstack([np.zeros(3), np.eye(3)])
        edges = elements.TET_EDGES
        mids = 0.5 * (verts[edges[:, 0]] + verts[edges[:, 1]])
        nodes = np.vstack([verts, mids])
    phi, _ = elements.tabulate(dim, deg, nodes)
    assert np.allclose(phi, np.eye(len(nodes)), atol=1e-12)


def test_mesh_counts_and_area():
    mesh, markers, *_ = generate_square(4, 2.0)
    assert mesh.num_vertices == 25
    assert mesh.num_cells == 32
    _, detJ = assemble.cell_geometry(mesh)
    assert np.isclose(detJ.sum() * 0.5, 4.0)  # area = 2x2

    mesh3, *_ = generate_cube(2, 3.0)
    _, detJ3 = assemble.cell_geometry(mesh3)
    assert np.isclose(detJ3.sum() / 6.0, 27.0)


def test_boundary_facets_square():
    mesh, markers, LEFT, RIGHT, TOP, BOTTOM, NONE = generate_square(4, 1.0)
    # 4 sides x 4 facets
    assert mesh.boundary_facets.shape[0] == 16
    for tag in (LEFT, RIGHT, TOP, BOTTOM):
        assert len(markers.facets_with([tag])) == 4
    n = mesh.boundary_facet_normals()
    # all normals unit and axis-aligned
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)


def test_uniform_refine_preserves_volume():
    mesh, *_ = generate_square(2, 1.0)
    r = refine_uniform(mesh)
    assert r.num_cells == 4 * mesh.num_cells
    _, detJ = assemble.cell_geometry(r)
    assert np.isclose(detJ.sum() * 0.5, 1.0)

    mesh3, *_ = generate_cube(2, 1.0)
    r3 = refine_uniform(mesh3)
    assert r3.num_cells == 8 * mesh3.num_cells
    _, detJ3 = assemble.cell_geometry(r3)
    assert np.isclose(detJ3.sum() / 6.0, 1.0)


def _check_conforming(mesh):
    # every interior facet appears exactly twice
    d = mesh.dim
    if d == 2:
        locf = np.array([[1, 2], [0, 2], [0, 1]])
    else:
        locf = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])
    facets = np.sort(mesh.cells[:, locf].reshape(-1, d), axis=1)
    _, counts = np.unique(facets, axis=0, return_counts=True)
    assert counts.max() <= 2


def test_footing_mesh_locally_refined_and_conforming():
    mesh, markers, *_ = generate_footing_square(8, 64.0)
    _check_conforming(mesh)
    _, detJ = assemble.cell_geometry(mesh)
    assert np.isclose(detJ.sum() * 0.5, 64.0**2)
    # refined zone has smaller cells than the coarse zone
    vc = mesh.vertices[mesh.cells]
    top_center = (vc[:, :, 1].min(axis=1) > 2 * 64 / 3) & (
        (vc[:, :, 0].min(axis=1) > 64 / 8) & (vc[:, :, 0].max(axis=1) < 7 * 64 / 8)
    )
    areas = detJ * 0.5
    assert areas[top_center].mean() < 0.5 * areas[~top_center].mean()


def test_refine_marked_3d_conforming():
    """3D local refinement (Rivara longest-edge bisection on tets,
    reference lib/MeshCreation.py:66-73 dimension-generic refine): marked
    cells refine, the mesh stays conforming, total volume is preserved,
    and a P2 Poisson solve on the refined mesh still works."""
    from porotpu.fem.mesh import refine_marked

    mesh, *_ = generate_cube(3, 1.0)
    _, detJ0 = assemble.cell_geometry(mesh)
    vol0 = detJ0.sum() / 6.0
    # mark cells touching the top-center region
    vc = mesh.vertices[mesh.cells]
    marked = (vc[:, :, 2].min(axis=1) > 0.6) & (
        (vc[:, :, 0].min(axis=1) > 0.2) & (vc[:, :, 0].max(axis=1) < 0.8)
    )
    assert marked.any()
    fine = refine_marked(mesh, marked, passes=2)
    assert fine.num_cells > mesh.num_cells
    _check_conforming(fine)
    _, detJ = assemble.cell_geometry(fine)
    assert (detJ > 0).all()
    assert np.isclose(detJ.sum() / 6.0, vol0)
    # marked zone ended up finer than the rest
    vcf = fine.vertices[fine.cells]
    zone = (vcf[:, :, 2].min(axis=1) > 0.6) & (
        (vcf[:, :, 0].min(axis=1) > 0.2) & (vcf[:, :, 0].max(axis=1) < 0.8)
    )
    vols = detJ / 6.0
    assert vols[zone].mean() < 0.7 * vols[~zone].mean()
    # FE sanity: P2 stiffness on the refined mesh has the constant nullspace
    V = FunctionSpace(fine, 2)
    K = assemble.stiffness(V)
    assert np.allclose(K @ np.ones(V.num_dofs), 0.0, atol=1e-9)


def test_mass_matrix_total():
    mesh, *_ = generate_square(4, 1.0)
    Vp = FunctionSpace(mesh, 1)
    M = assemble.mass(Vp)
    assert np.isclose(M.sum(), 1.0)
    V2 = FunctionSpace(mesh, 2)
    M2 = assemble.mass(V2)
    assert np.isclose(M2.sum(), 1.0)
    Vv = FunctionSpace(mesh, 2, vector=True)
    Mv = assemble.mass(Vv)
    assert np.isclose(Mv.sum(), 2.0)  # one per component


def test_stiffness_nullspace_and_poisson():
    mesh, markers, LEFT, RIGHT, TOP, BOTTOM, NONE = generate_square(8, 1.0)
    V = FunctionSpace(mesh, 2)
    K = assemble.stiffness(V)
    ones = np.ones(V.num_dofs)
    assert np.allclose(K @ ones, 0.0, atol=1e-10)

    # manufactured: -lap u = f, u = sin(pi x) sin(pi y), homogeneous Dirichlet
    x = V.node_coords
    uex = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    f = 2 * np.pi**2 * uex
    M = assemble.mass(V)
    b = M @ f
    bdofs = V.boundary_nodes()
    from porotpu.fem.bcs import apply_bcs_matrix, apply_bcs_vector

    Kb = apply_bcs_matrix(K.tocsr(), bdofs)
    bb = apply_bcs_vector(b, bdofs, np.zeros(bdofs.size))
    u = spla.spsolve(Kb.tocsc(), bb)
    assert np.max(np.abs(u - uex)) < 5e-3  # P2, h=1/8


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_p3_lagrange_and_partition(dim):
    """P3 basis: Kronecker property at its own nodes + partition of unity
    (--fe-solid 3 support, reference lib/Parser.py:23-24)."""
    verts = np.vstack([np.zeros(dim), np.eye(dim)])
    nodes = [verts[i] for i in range(dim + 1)]
    for j, k in elements.edge_list(dim):
        nodes.append((2 * verts[j] + verts[k]) / 3.0)
        nodes.append((verts[j] + 2 * verts[k]) / 3.0)
    for f in elements._bubble_faces(dim):
        nodes.append(verts[list(f)].mean(axis=0))
    nodes = np.asarray(nodes)
    phi, dphi = elements.tabulate(dim, 3, nodes)
    assert np.allclose(phi, np.eye(len(nodes)), atol=1e-12)
    rng = np.random.default_rng(0)
    pts = rng.random((17, dim)) * (1.0 / dim)
    phi, dphi = elements.tabulate(dim, 3, pts)
    assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(dphi.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("deg", [6])
def test_quadrature_degree6_exactness(deg):
    """Collapsed Gauss-Jacobi rules (degree > 4) integrate all monomials
    of total degree <= 6 exactly — needed by P3 mass (degree 6)."""
    pts, wts = quadrature.simplex_rule(2, deg)
    for p in range(deg + 1):
        for q in range(deg + 1 - p):
            val = np.sum(wts * pts[:, 0] ** p * pts[:, 1] ** q)
            assert np.isclose(val, _monomial_integral_tri(p, q), atol=1e-13)
    pts, wts = quadrature.simplex_rule(3, deg)
    for p in range(deg + 1):
        for q in range(deg + 1 - p):
            for r in range(deg + 1 - p - q):
                val = np.sum(wts * pts[:, 0] ** p * pts[:, 1] ** q * pts[:, 2] ** r)
                assert np.isclose(val, _monomial_integral_tet(p, q, r), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p3_galerkin_exactness_cubic(dim):
    """P3 convergence oracle: a CUBIC manufactured solution lies in the P3
    space, so the discrete Poisson solution must equal its interpolant to
    machine precision (Galerkin exactness) — a far sharper check than a
    rate estimate.  Exercises the P3 dofmap (edge orientation, face
    bubbles), stiffness/mass assembly at degree 6 quadrature, and BC node
    queries on every boundary facet."""
    if dim == 2:
        mesh, *_ = generate_square(4, 1.0)
    else:
        mesh, *_ = generate_cube(3, 1.0)
    V = FunctionSpace(mesh, 3)
    x = V.node_coords
    # u cubic, f = -lap u
    if dim == 2:
        uex = x[:, 0] ** 3 + 2.0 * x[:, 1] ** 3 + x[:, 0] * x[:, 1] ** 2 + x[:, 0]
        f = -(6.0 * x[:, 0] + 12.0 * x[:, 1] + 2.0 * x[:, 0])
    else:
        uex = (
            x[:, 0] ** 3
            + 2.0 * x[:, 1] ** 3
            + x[:, 2] ** 3
            + x[:, 0] * x[:, 1] * x[:, 2]
        )
        f = -(6.0 * x[:, 0] + 12.0 * x[:, 1] + 6.0 * x[:, 2])
    K = assemble.stiffness(V)
    ones = np.ones(V.num_dofs)
    assert np.allclose(K @ ones, 0.0, atol=1e-9)
    M = assemble.mass(V)
    # total mass = volume (partition of unity after assembly)
    assert np.isclose(M.sum(), 1.0, atol=1e-10)
    # NOTE: f is itself polynomial (degree 1) => M @ f is the EXACT load
    # for -lap u against every P3 test function; no quadrature crime
    b = M @ f
    bdofs = V.boundary_nodes()
    from porotpu.fem.bcs import apply_bcs_matrix, apply_bcs_vector

    Kb = apply_bcs_matrix(K.tocsr(), bdofs)
    bb = apply_bcs_vector(b, bdofs, uex[bdofs])
    u = spla.spsolve(Kb.tocsc(), bb)
    assert np.max(np.abs(u - uex)) < 1e-8


def test_p3_facet_load_cubic_exact():
    """P3 surface-load assembly: a constant traction on tagged facets must
    integrate exactly (sum of load vector = traction * boundary length),
    and the entries must reproduce ∫ g phi_a ds for a CUBIC g — exact for
    the facet P3 element with the degree-6 facet rule."""
    mesh, markers, LEFT, RIGHT, TOP, BOTTOM, NONE = generate_square(3, 1.0)
    from porotpu.fem.mesh import generate_boundary_measure
    from porotpu.models.loads import NormalLoad

    ds_top = generate_boundary_measure(mesh, markers, [TOP])
    V = FunctionSpace(mesh, 3, vector=True)
    b = assemble.facet_load(V, ds_top, NormalLoad(lambda t: 1.0), 0.0)
    # normal on TOP is (0, 1): total = length 1 in component y
    assert np.isclose(b[1::2].sum(), 1.0, atol=1e-12)
    assert np.isclose(b[0::2].sum(), 0.0, atol=1e-12)
    # cubic-in-x traction via the expression-load path exercises phi
    # against a cubic on each facet
    from porotpu.models.loads import ExprLoad

    g = ExprLoad(lambda t, x: np.stack(
        [np.zeros(x.shape[0]), x[:, 0] ** 3], axis=1
    ))
    bg = assemble.facet_load(V, ds_top, g, 0.0)
    assert np.isclose(bg[1::2].sum(), 0.25, atol=1e-12)  # ∫0^1 x^3 = 1/4


def test_hooke_rigid_modes():
    mesh, *_ = generate_square(4, 1.0)
    V = FunctionSpace(mesh, 2, vector=True)
    K = assemble.hooke(V, mu=3.0, lam=2.0)
    x = V.node_coords
    # translations
    for c in range(2):
        u = np.zeros(V.num_dofs)
        u[c::2] = 1.0
        assert np.allclose(K @ u, 0.0, atol=1e-9)
    # rotation (-y, x)
    u = np.zeros(V.num_dofs)
    u[0::2] = -x[:, 1]
    u[1::2] = x[:, 0]
    assert np.allclose(K @ u, 0.0, atol=1e-9)


def test_div_coupling_exact():
    mesh, *_ = generate_square(4, 1.0)
    Q = FunctionSpace(mesh, 1)
    V = FunctionSpace(mesh, 2, vector=True)
    D = assemble.div_coupling(Q, V)
    # u = (x, y): div u = 2 -> D u = 2 * ∫ psi = 2 * M_q @ 1
    u = np.zeros(V.num_dofs)
    u[0::2] = V.node_coords[:, 0]
    u[1::2] = V.node_coords[:, 1]
    Mq = assemble.mass(Q)
    assert np.allclose(D @ u, 2.0 * (Mq @ np.ones(Q.num_dofs)), atol=1e-12)


def test_facet_load_constant_traction():
    from porotpu.fem.mesh import generate_boundary_measure
    from porotpu.models.loads import ConstantLoad

    mesh, markers, LEFT, RIGHT, TOP, BOTTOM, NONE = generate_square(4, 2.0)
    V = FunctionSpace(mesh, 2, vector=True)
    ds_top = generate_boundary_measure(mesh, markers, [TOP])
    g = ConstantLoad([0.0, -5.0])
    b = assemble.facet_load(V, ds_top, g, t=0.0)
    # total force = traction * side length
    assert np.isclose(b[0::2].sum(), 0.0)
    assert np.isclose(b[1::2].sum(), -10.0)


def test_facet_load_normal_3d():
    from porotpu.fem.mesh import generate_boundary_measure
    from porotpu.models.loads import NormalLoad

    mesh, markers, XP, XM, YP, YM, ZP, ZM = generate_cube(2, 1.0)
    V = FunctionSpace(mesh, 2, vector=True)
    ds = generate_boundary_measure(mesh, markers, [ZP])
    g = NormalLoad(lambda t: -3.0)
    b = assemble.facet_load(V, ds, g, t=1.0)
    # outward normal on ZP is +z: total force = -3 * area = -3
    assert np.isclose(b[2::3].sum(), -3.0)
    assert np.isclose(b[0::3].sum(), 0.0, atol=1e-12)


def test_mixed_space_layout():
    mesh, *_ = generate_square(3, 1.0)
    Vs = FunctionSpace(mesh, 2, vector=True)
    Vf = FunctionSpace(mesh, 2, vector=True)
    Qp = FunctionSpace(mesh, 1)
    W = MixedSpace({"s": Vs, "f": Vf, "p": Qp})
    ns, nf, npp = W.get_dimensions()
    assert ns == Vs.num_dofs and nf == Vf.num_dofs and npp == Qp.num_dofs
    assert W.num_dofs == ns + nf + npp
    assert W.field("f").offset == ns
    assert W.field("p").slice == slice(ns + nf, ns + nf + npp)


def test_cell_load_nodal_equals_mass_apply():
    """Nodal volume loads (reference lib/Assembler.py:243-259 arbitrary
    expression forcing): cell_load(f_at_nodes) must equal M @ f exactly,
    and reduce to the f_const path for constant f."""
    import numpy as np

    from porotpu.fem import assemble
    from porotpu.fem.dofmap import FunctionSpace
    from porotpu.fem.mesh import generate_square

    out = generate_square(6, 1.0)
    mesh = out[0] if isinstance(out, tuple) else out
    rng = np.random.default_rng(1)
    for vector, deg in ((False, 1), (True, 2)):
        V = FunctionSpace(mesh, deg, vector=vector)
        f = rng.normal(size=V.num_dofs)
        b = assemble.cell_load(V, f_at_nodes=f)
        M = assemble.mass(V)
        assert np.allclose(b, M @ f, atol=1e-12)
        if vector:
            fc = np.tile([1.3, -0.4], V.num_dofs // 2)
            b1 = assemble.cell_load(V, f_at_nodes=fc)
            b2 = assemble.cell_load(V, f_const=[1.3, -0.4])
        else:
            b1 = assemble.cell_load(V, f_at_nodes=np.full(V.num_dofs, 2.5))
            b2 = assemble.cell_load(V, f_const=2.5)
        assert np.allclose(b1, b2, atol=1e-12)


def test_expression_volume_loads_assemble():
    """Expression-valued fs_vol/p_source route through the nodal path and
    produce finite nonzero loads (previously NotImplementedError)."""
    import numpy as np

    from porotpu.models import benchmarks
    from porotpu.models.loads import ExprLoad

    ov = {"pc type": "diagonal", "inner pc type": "lu"}
    prob = benchmarks.swelling(Nelements=4, overrides=ov)
    prob.assembler.fs_vol = ExprLoad(
        lambda t, x: np.stack([np.sin(x[:, 0] * 500) * t, x[:, 1] * 0], axis=1)
    )
    prob.assembler.p_source = ExprLoad(lambda t, x: t * x[:, 0] * 100)
    b = prob.assembler.get_load_vector(0.1)
    assert np.isfinite(b).all() and np.abs(b).max() > 0
