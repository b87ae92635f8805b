"""Vectorized FE assembly of the poromechanics bilinear/linear forms.

Replaces FFC/UFL-generated C++ element kernels + DOLFIN parallel assembly
(reference: every ``assemble(...)`` in lib/Assembler.py).  All element
tensors are computed for all cells at once with einsum over
(cell, quadrature, basis, dim) arrays; the global scatter goes through
scipy.sparse COO->CSR.  This is host-side setup code: matrices are
assembled once per problem (the reference's operators are time-independent,
lib/Assembler.py:66-97) and then shipped to device in ELL format.

Element-matrix identities used below (g = physical basis gradients):
  mass:        E[(a,c),(b,d)] = delta_cd  ∫ phi_a phi_b
  eps:eps:     E[(a,c),(b,d)] = 1/2 ∫ ( delta_cd  grad phi_a . grad phi_b
                                        + d_d phi_a  d_c phi_b )
  div div:     E[(a,c),(b,d)] = ∫ d_c phi_a  d_d phi_b
  q div(u):    E[a,(b,d)]     = ∫ psi_a  d_d phi_b
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from . import elements, quadrature
from .dofmap import FunctionSpace


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def cell_geometry(mesh):
    """Affine cell maps: returns (invJT (nc, dim, dim), detJ (nc,))."""
    v = mesh.vertices[mesh.cells]  # (nc, dim+1, dim)
    J = np.transpose(v[:, 1:, :] - v[:, :1, :], (0, 2, 1))  # (nc, dim, dim)
    detJ = np.abs(np.linalg.det(J))
    invJ = np.linalg.inv(J)
    invJT = np.transpose(invJ, (0, 2, 1))
    return invJT, detJ


def _tabulated(space: FunctionSpace, degree_q: int):
    mesh = space.mesh
    pts, wts = quadrature.simplex_rule(mesh.dim, degree_q)
    phi, dphi_ref = elements.tabulate(mesh.dim, space.degree, pts)
    invJT, detJ = cell_geometry(mesh)
    # physical gradients: g[e, q, a, k] = dphi_ref[q, a, m] * invJ[m, k]
    g = np.einsum("qam,ekm->eqak", dphi_ref, invJT)
    return phi, g, wts, detJ


def _scatter(rows, cols, vals, shape) -> sp.csr_matrix:
    A = sp.coo_matrix(
        (vals.ravel(), (rows.ravel(), cols.ravel())), shape=shape
    ).tocsr()
    A.sum_duplicates()
    return A


def _scatter_matrix(test: FunctionSpace, trial: FunctionSpace, E) -> sp.csr_matrix:
    """E: (nc, nb_test_dofs, nb_trial_dofs) element matrices."""
    rd = test.cell_dofs  # (nc, nbt)
    cd = trial.cell_dofs  # (nc, nbu)
    rows = np.repeat(rd[:, :, None], cd.shape[1], axis=2)
    cols = np.repeat(cd[:, None, :], rd.shape[1], axis=1)
    return _scatter(rows, cols, E, (test.num_dofs, trial.num_dofs))


def _expand_vector(E_scalar_block, dim, kind):
    """Expand scalar-basis blocks into vector-dof element matrices.

    kind='mass': E[(a,c),(b,d)] = delta_cd * M_ab
    """
    nc, na, nb = E_scalar_block.shape
    out = np.zeros((nc, na * dim, nb * dim))
    for c in range(dim):
        out[:, c::dim, c::dim] = E_scalar_block
    return out


# ---------------------------------------------------------------------------
# bilinear forms
# ---------------------------------------------------------------------------


def mass(space: FunctionSpace, coeff: float = 1.0, qdeg=None) -> sp.csr_matrix:
    """coeff * ∫ u v  (scalar) or coeff * ∫ u . v (vector)."""
    qdeg = qdeg or 2 * space.degree
    phi, g, wts, detJ = _tabulated(space, qdeg)
    M = np.einsum("q,qa,qb,e->eab", wts, phi, phi, detJ) * coeff
    if space.vector:
        M = _expand_vector(M, space.ncomp, "mass")
    return _scatter_matrix(space, space, M)


def mass_coupling(
    test: FunctionSpace, trial: FunctionSpace, coeff: float = 1.0
) -> sp.csr_matrix:
    """coeff * ∫ u . v between two (same-mesh) vector spaces.

    Used for the Darcy drag coupling blocks (reference lib/Assembler.py:83,89).
    """
    assert test.mesh is trial.mesh
    qdeg = test.degree + trial.degree
    pts, wts = quadrature.simplex_rule(test.mesh.dim, qdeg)
    phit, _ = elements.tabulate(test.mesh.dim, test.degree, pts)
    phiu, _ = elements.tabulate(test.mesh.dim, trial.degree, pts)
    _, detJ = cell_geometry(test.mesh)
    M = np.einsum("q,qa,qb,e->eab", wts, phit, phiu, detJ) * coeff
    if test.vector:
        M = _expand_vector(M, test.ncomp, "mass")
    return _scatter_matrix(test, trial, M)


def stiffness(space: FunctionSpace, coeff: float = 1.0) -> sp.csr_matrix:
    """coeff * ∫ grad p . grad q  (scalar space)."""
    qdeg = 2 * (space.degree - 1) + 2
    phi, g, wts, detJ = _tabulated(space, qdeg)
    K = np.einsum("q,eqak,eqbk,e->eab", wts, g, g, detJ) * coeff
    return _scatter_matrix(space, space, K)


def eps_eps(space: FunctionSpace, coeff: float = 1.0) -> sp.csr_matrix:
    """coeff * ∫ eps(u) : eps(v)  (vector space)."""
    assert space.vector
    dim = space.ncomp
    qdeg = 2 * space.degree
    phi, g, wts, detJ = _tabulated(space, qdeg)
    K = np.einsum("q,eqak,eqbk,e->eab", wts, g, g, detJ)  # grad.grad
    G = np.einsum("q,eqad,eqbc,e->eabdc", wts, g, g, detJ)  # d_d a * d_c b
    nc, na, nb = K.shape
    E = np.zeros((nc, na * dim, nb * dim))
    for c in range(dim):
        for d in range(dim):
            blk = 0.5 * G[:, :, :, d, c]
            if c == d:
                blk = blk + 0.5 * K
            E[:, c::dim, d::dim] = blk
    return _scatter_matrix(space, space, coeff * E)


def divdiv(space: FunctionSpace, coeff: float = 1.0) -> sp.csr_matrix:
    """coeff * ∫ div(u) div(v)  (vector space)."""
    assert space.vector
    dim = space.ncomp
    qdeg = 2 * space.degree
    phi, g, wts, detJ = _tabulated(space, qdeg)
    G = np.einsum("q,eqac,eqbd,e->eabcd", wts, g, g, detJ)
    nc, na, nb = G.shape[:3]
    E = np.zeros((nc, na * dim, nb * dim))
    for c in range(dim):
        for d in range(dim):
            E[:, c::dim, d::dim] = G[:, :, :, c, d]
    return _scatter_matrix(space, space, coeff * E)


def hooke(space: FunctionSpace, mu: float, lam: float) -> sp.csr_matrix:
    """∫ hooke(eps(u)) : eps(v) = 2 mu eps:eps + lam div div.

    (reference lib/Assembler.py:69-70)
    """
    return (eps_eps(space, 2.0 * mu) + divdiv(space, lam)).tocsr()


def div_coupling(
    test_scalar: FunctionSpace, trial_vec: FunctionSpace, coeff: float = 1.0
) -> sp.csr_matrix:
    """coeff * ∫ q div(u): rows = scalar test, cols = vector trial.

    (reference lib/Assembler.py:92-93: div(phi vf) q terms)
    """
    assert trial_vec.vector and not test_scalar.vector
    mesh = test_scalar.mesh
    dim = mesh.dim
    qdeg = test_scalar.degree + trial_vec.degree
    pts, wts = quadrature.simplex_rule(dim, qdeg)
    psi, _ = elements.tabulate(dim, test_scalar.degree, pts)
    _, dphi_ref = elements.tabulate(dim, trial_vec.degree, pts)
    invJT, detJ = cell_geometry(mesh)
    g = np.einsum("qam,ekm->eqak", dphi_ref, invJT)
    D = np.einsum("q,qa,eqbd,e->eabd", wts, psi, g, detJ)  # (nc, na_s, nb_v, dim)
    nc, na, nb, _ = D.shape
    E = np.zeros((nc, na, nb * dim))
    for d in range(dim):
        E[:, :, d::dim] = D[:, :, :, d]
    return _scatter_matrix(test_scalar, trial_vec, coeff * E)


# ---------------------------------------------------------------------------
# linear forms (loads)
# ---------------------------------------------------------------------------


def cell_load(space: FunctionSpace, f_at_nodes=None, f_const=None) -> np.ndarray:
    """∫ f . v dx with f constant (f_const) or nodal (interpolated, P-space).

    Returns dense vector of size space.num_dofs.
    """
    qdeg = 2 * space.degree
    phi, g, wts, detJ = _tabulated(space, qdeg)
    b = np.zeros(space.num_dofs)
    if f_const is not None:
        f_const = np.atleast_1d(np.asarray(f_const, dtype=float))
        # ∫ f_c phi_a per cell
        Fa = np.einsum("q,qa,e->ea", wts, phi, detJ)  # (nc, nb)
        if space.vector:
            for c in range(space.ncomp):
                np.add.at(b, space.cell_dofs[:, c :: space.ncomp], Fa * f_const[c])
        else:
            np.add.at(b, space.cell_dofs, Fa * float(f_const[0]))
        return b
    raise NotImplementedError("nodal volume loads not needed by the benchmarks")


def _facet_tabulation(space: FunctionSpace, facet_ids: np.ndarray):
    """Facet-local P1/P2 tabulation + geometry for boundary facets.

    Returns (facet_dofnodes (nf, nbf), phi (nq, nbf), wts (nq,), detJ (nf,),
    points (nf, nq, dim), normals (nf, dim)).
    """
    mesh = space.mesh
    dim = mesh.dim
    f = mesh.boundary_facets[facet_ids]  # (nf, dim)
    verts = mesh.vertices
    # facet treated as a (dim-1)-simplex Lagrange element of same degree
    pts, wts = quadrature.facet_rule(dim, 2 * space.degree)
    fdim = dim - 1
    phi, _ = elements.tabulate(fdim, space.degree, pts) if fdim >= 1 else (None, None)

    # facet node ids in space numbering: vertices then edge midpoints
    nodes = [f]
    if space.degree == 2:
        nv = mesh.num_vertices
        if dim == 2:
            eids = space._edge_lookup(np.sort(f, axis=1))
            nodes.append((nv + eids)[:, None])
        else:
            # P2 triangle edge ordering: (1,2), (0,2), (0,1)
            pairs = np.stack([f[:, [1, 2]], f[:, [0, 2]], f[:, [0, 1]]], axis=1)
            eids = space._edge_lookup(np.sort(pairs.reshape(-1, 2), axis=1))
            nodes.append(nv + eids.reshape(-1, 3))
    fnodes = np.concatenate(nodes, axis=1)  # (nf, nbf)

    # geometry of the facet chart
    if dim == 2:
        t = verts[f[:, 1]] - verts[f[:, 0]]
        detJ = np.linalg.norm(t, axis=1)
        # physical quad points
        x = verts[f[:, 0]][:, None, :] + pts[None, :, :] * t[:, None, :]
    else:
        e1 = verts[f[:, 1]] - verts[f[:, 0]]
        e2 = verts[f[:, 2]] - verts[f[:, 0]]
        detJ = np.linalg.norm(np.cross(e1, e2), axis=1)
        x = (
            verts[f[:, 0]][:, None, :]
            + pts[None, :, 0:1] * e1[:, None, :]
            + pts[None, :, 1:2] * e2[:, None, :]
        )
    normals = mesh.boundary_facet_normals()[facet_ids]
    return fnodes, phi, wts, detJ, x, normals


def facet_load(space: FunctionSpace, measure, load, t: float) -> np.ndarray:
    """∫_dsN f(t) . v ds over the measure's tagged facets.

    ``load`` follows the loads API (porotpu.models.loads): it evaluates to
    values at quadrature points given (t, x, n).
    Returns dense vector of size space.num_dofs.
    """
    b = np.zeros(space.num_dofs)
    fids = measure.facet_ids
    if fids.size == 0 or load is None:
        return b
    fnodes, phi, wts, detJ, x, normals = _facet_tabulation(space, fids)
    nf, nq = x.shape[0], x.shape[1]
    vals = load.eval(t, x.reshape(-1, x.shape[-1]), np.repeat(normals, nq, axis=0))
    if space.vector:
        vals = np.asarray(vals, dtype=float).reshape(nf, nq, space.ncomp)
        # F[f, a, c] = sum_q w_q detJ_f vals[f,q,c] phi[q,a]
        F = np.einsum("q,fqc,qa,f->fac", wts, vals, phi, detJ)
        for c in range(space.ncomp):
            np.add.at(b, fnodes * space.ncomp + c, F[:, :, c])
    else:
        vals = np.asarray(vals, dtype=float).reshape(nf, nq)
        F = np.einsum("q,fq,qa,f->fa", wts, vals, phi, detJ)
        np.add.at(b, fnodes, F)
    return b
