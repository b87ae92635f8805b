"""Mesh XDMF save/load roundtrip + prolateGeometry loader."""

import numpy as np

from porotpu.fem.mesh import generate_cube, generate_square
from porotpu.fem.meshio import load_mesh_xdmf, prolateGeometry, save_mesh_xdmf


def test_mesh_roundtrip_2d(tmp_path):
    mesh, markers, *_ = generate_square(4, 2.0)
    base = str(tmp_path / "sq")
    save_mesh_xdmf(base, mesh, markers)
    m2, mk2 = load_mesh_xdmf(base)
    assert np.allclose(m2.vertices, mesh.vertices)
    assert np.array_equal(m2.cells, mesh.cells)
    # marker tags survive (facet order may differ; compare as multisets
    # keyed by sorted facet)
    a = {tuple(sorted(f)): t for f, t in zip(mesh.boundary_facets, markers.tags)}
    b = {tuple(sorted(f)): t for f, t in zip(m2.boundary_facets, mk2.tags)}
    assert a == b


def test_prolate_geometry_loader(tmp_path):
    mesh, markers, *_ = generate_cube(2, 1.0)
    d = tmp_path / "meshes"
    d.mkdir()
    save_mesh_xdmf(str(d / "heart"), mesh, markers)
    m2, mk2, ENDO, EPI, BASE, NONE = prolateGeometry("heart", meshes_dir=str(d))
    assert (ENDO, EPI, BASE, NONE) == (20, 10, 50, 99)
    assert np.allclose(m2.vertices, mesh.vertices * 1e-3)
