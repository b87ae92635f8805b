"""DIA banded container: correctness vs scipy (matvec/rmatvec, embeddings,
format dispatch, unrolled vs scan paths).

The DIA format replaces the gather-path ELL as the production SpMV
(reference analogue: PETSc CSR MatMult, lib/AAR.py:135).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from porotpu.ops import DIA, ELL, Transposed, device_matrix
from porotpu.ops import dia as dia_mod


def banded_random(n, offsets, rng, density=0.8):
    rows, cols, vals = [], [], []
    for o in offsets:
        i = np.arange(max(0, -o), min(n, n - o))
        keep = rng.random(i.size) < density
        i = i[keep]
        rows.append(i)
        cols.append(i + o)
        vals.append(rng.normal(size=i.size))
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    return A


def test_dia_square_matvec_rmatvec():
    rng = np.random.default_rng(0)
    n = 200
    A = banded_random(n, [-7, -3, -1, 0, 1, 2, 9], rng)
    D = DIA.from_csr(A, dtype=jnp.float64)
    x = rng.normal(size=n)
    np.testing.assert_allclose(D.matvec(jnp.asarray(x)), A @ x, rtol=1e-12)
    np.testing.assert_allclose(D.rmatvec(jnp.asarray(x)), A.T @ x, rtol=1e-12)
    np.testing.assert_allclose(D.to_dense(), A.toarray(), rtol=1e-12)


def test_dia_scan_path(monkeypatch):
    """> UNROLL_MAX diagonals exercises the chunked lax.scan path.

    The production threshold is large (every production operator takes
    the GSPMD-friendly unrolled path, ops/dia.py:UNROLL_MAX), so force a
    small one to cover the scan fallback.
    """
    monkeypatch.setattr(dia_mod, "UNROLL_MAX", 64)
    rng = np.random.default_rng(1)
    n = 300
    offsets = np.unique(rng.integers(-90, 90, size=64 + 40))
    A = banded_random(n, offsets, rng, density=0.5)
    D = DIA.from_csr(A, dtype=jnp.float64)
    assert D.data.shape[0] > dia_mod.UNROLL_MAX
    assert D.data.shape[0] % dia_mod.CHUNK == 0
    x = rng.normal(size=n)
    y = jax.jit(lambda d, v: d.matvec(v))(D, jnp.asarray(x))
    np.testing.assert_allclose(y, A @ x, rtol=1e-11)
    yt = jax.jit(lambda d, v: d.rmatvec(v))(D, jnp.asarray(x))
    np.testing.assert_allclose(yt, A.T @ x, rtol=1e-11)


def test_dia_col_emb_rect():
    """Prolongator-like rectangular block with a column embedding."""
    rng = np.random.default_rng(2)
    nf, nc = 120, 40
    emb = np.sort(rng.choice(nf, size=nc, replace=False))
    # entries live near the embedded slot -> banded under emb
    rows, cols, vals = [], [], []
    for j in range(nc):
        i = np.clip(emb[j] + np.arange(-2, 3), 0, nf - 1)
        rows.append(i)
        cols.append(np.full(i.size, j))
        vals.append(rng.normal(size=i.size))
    P = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nf, nc),
    )
    D = DIA.from_csr(P, dtype=jnp.float64, col_emb=emb)
    xc = rng.normal(size=nc)
    xf = rng.normal(size=nf)
    np.testing.assert_allclose(D.matvec(jnp.asarray(xc)), P @ xc, rtol=1e-12)
    np.testing.assert_allclose(D.rmatvec(jnp.asarray(xf)), P.T @ xf, rtol=1e-12)
    np.testing.assert_allclose(D.to_dense(), P.toarray(), rtol=1e-12)


def test_device_matrix_dispatch():
    from porotpu.ops import Dense

    rng = np.random.default_rng(3)
    n = 150
    A = banded_random(n, [-2, 0, 2], rng)
    assert isinstance(device_matrix(A, jnp.float64), DIA)
    # scrambled columns: not banded -> small blocks go dense (MXU)
    perm = rng.permutation(n)
    B = A.tocoo()
    B = sp.csr_matrix((B.data, (B.row, perm[B.col])), shape=(n, n))
    dev = device_matrix(B, jnp.float64, max_diags=8)
    assert isinstance(dev, Dense)
    x = rng.normal(size=n)
    np.testing.assert_allclose(dev.matvec(jnp.asarray(x)), B @ x, rtol=1e-12)
    np.testing.assert_allclose(dev.rmatvec(jnp.asarray(x)), B.T @ x, rtol=1e-12)
    # too large for dense -> ELL last resort
    dev2 = device_matrix(B, jnp.float64, max_diags=8, dense_max=100)
    assert isinstance(dev2, ELL)
    np.testing.assert_allclose(dev2.matvec(jnp.asarray(x)), B @ x, rtol=1e-12)


def test_device_matrix_transposed_row_emb():
    """Tall-skinny (p,s)-like block stores its banded transpose."""
    rng = np.random.default_rng(4)
    nrow, ncol = 40, 120
    emb = np.sort(rng.choice(ncol, size=nrow, replace=False))
    rows, cols, vals = [], [], []
    for i in range(nrow):
        j = np.clip(emb[i] + np.arange(-2, 3), 0, ncol - 1)
        cols.append(j)
        rows.append(np.full(j.size, i))
        vals.append(rng.normal(size=j.size))
    M = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nrow, ncol),
    )
    dev = device_matrix(M, jnp.float64, row_emb=emb, max_diags=16)
    assert isinstance(dev, Transposed)
    x = rng.normal(size=ncol)
    y = rng.normal(size=nrow)
    np.testing.assert_allclose(dev.matvec(jnp.asarray(x)), M @ x, rtol=1e-12)
    np.testing.assert_allclose(dev.rmatvec(jnp.asarray(y)), M.T @ y, rtol=1e-12)


def test_vertex_embedding_blocks():
    """P1 pressure block embeds into the P2 vector lattice: (s,p) coupling
    assembled on a real mesh stays banded and products match scipy."""
    from porotpu.fem.dofmap import FunctionSpace, vertex_embedding
    from porotpu.fem.mesh import generate_square

    mesh = generate_square(5, 1.0)[0]
    Vs = FunctionSpace(mesh, 2, vector=True)
    Qp = FunctionSpace(mesh, 1, vector=False)
    emb = vertex_embedding(Qp, Vs, Qp.num_dofs + 3, Vs.num_dofs + 6)
    assert emb is not None
    assert len(np.unique(emb)) == emb.size  # injective incl. pad slots
    assert emb.size == Qp.num_dofs + 3
    assert emb.max() < Vs.num_dofs + 6


def test_pallas_mv_kernel_interpret():
    """The Pallas banded-matvec kernel (ops/pallas_dia.py) against scipy,
    in interpreter mode (runs on CPU): aligned + partial final tile,
    embedded-x zero regions, and offsets spanning multiple 128-lane rows."""
    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from porotpu.ops import pallas_dia
    from porotpu.ops.dia import DIA

    if not pallas_dia.HAVE_PALLAS:
        import pytest

        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(3)
    for n, offs in (
        (1024, [-300, -129, -128, -1, 0, 1, 127, 128, 301]),
        (2048 + 1024, [-520, -42, 0, 5, 130, 515]),  # R=24: partial tiles
    ):
        A = sp.diags(
            [rng.normal(size=n) for _ in offs], offs, shape=(n, n)
        ).tocsr()
        D = DIA.from_csr(A, dtype=jnp.float32)
        x = rng.normal(size=n).astype(np.float32)
        y = np.asarray(
            pallas_dia.mv(
                D.data, D.offsets, jnp.asarray(x), n, interpret=True
            )
        )
        ref = A @ x
        assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())


def test_pallas_rmv_kernel_interpret():
    """The Pallas banded transpose-matvec kernel against scipy, in
    interpreter mode: aligned + partial final tile, single-tile case,
    offsets spanning multiple 128-lane rows in both directions, and the
    wide-band (slab > tile) scatter fallback."""
    import pytest

    from porotpu.ops import pallas_dia
    from porotpu.ops.dia import DIA

    if not pallas_dia.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(7)
    cases = [
        (1024, [-300, -129, -128, -1, 0, 1, 127, 128, 301], None),
        (2048 + 1024, [-520, -42, 0, 5, 130, 515], None),  # partial tiles
        (512, [-40, 0, 33], None),  # single tile (edges discarded)
        # wide bands: ML/MH span multiple 16-row tiles -> scatter fallback
        (4096, [-2500, -700, 0, 650, 2430], 16),
    ]
    for n, offs, t_force in cases:
        A = sp.diags(
            [rng.normal(size=n) for _ in offs], offs, shape=(n, n)
        ).tocsr()
        D = DIA.from_csr(A, dtype=jnp.float32)
        x = rng.normal(size=n).astype(np.float32)
        if t_force is not None:
            orig = pallas_dia.T_MAX
            pallas_dia.T_MAX = t_force
            pallas_dia._rkernel_call.cache_clear()
        try:
            y = np.asarray(
                pallas_dia.rmv(
                    D.data, D.offsets, jnp.asarray(x), n, interpret=True
                )
            )
        finally:
            if t_force is not None:
                pallas_dia.T_MAX = orig
                pallas_dia._rkernel_call.cache_clear()
        ref = A.T @ x
        assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max()), (n, offs)


def test_dia_transposed_layout_matches():
    """store_transpose builds dataT with dataT[d, i+o] = data[d, i]; the
    forward kernel on (dataT, -offsets) must equal A.T @ x (the production
    rmatvec fast path on TPU), incl. under a column embedding."""
    import pytest

    from porotpu.ops import pallas_dia
    from porotpu.ops.dia import DIA

    if not pallas_dia.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(9)
    # square banded
    n = 1280
    offs = [-300, -129, -1, 0, 1, 127, 301]
    A = sp.diags([rng.normal(size=n) for _ in offs], offs, shape=(n, n)).tocsr()
    D = DIA.from_csr(A, dtype=jnp.float32, store_transpose=True)
    assert D.dataT is not None and D.dataT.shape == (len(offs), n)
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(
        pallas_dia.mv(
            D.dataT, tuple(-o for o in D.offsets), jnp.asarray(x), n,
            interpret=True,
        )
    )
    ref = A.T @ x
    assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())
    # embedded prolongator: gather through col_emb afterwards
    nf, nc = 1280, 100
    emb = np.sort(rng.choice(nf, size=nc, replace=False))
    rows, cols, vals = [], [], []
    for j in range(nc):
        i = np.clip(emb[j] + np.arange(-130, 131, 26), 0, nf - 1)
        rows.append(i)
        cols.append(np.full(i.size, j))
        vals.append(rng.normal(size=i.size))
    P = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nf, nc),
    )
    Dp = DIA.from_csr(P, dtype=jnp.float32, col_emb=emb, store_transpose=True)
    assert Dp.dataT is not None and Dp.dataT.shape[1] == Dp.ne == nf
    r = rng.normal(size=nf).astype(np.float32)
    y = np.asarray(
        pallas_dia.mv(
            Dp.dataT, tuple(-o for o in Dp.offsets), jnp.asarray(r), nf,
            interpret=True,
        )
    )[np.asarray(Dp.col_emb)]
    ref = P.T @ r
    assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())


def test_store_transpose_rect_no_emb():
    """Regression: store_transpose on a RECTANGULAR block without a column
    embedding must size dataT by ncols (class ne semantics) — round-5 bug:
    ne=nrows raised IndexError in from_csr for ncols > nrows."""
    rng = np.random.default_rng(12)
    n, m = 40, 64
    rows = np.repeat(np.arange(n), 2)
    cols = np.clip(rows + rng.integers(0, 20, size=rows.size), 0, m - 1)
    A = sp.csr_matrix((rng.normal(size=rows.size), (rows, cols)), shape=(n, m))
    D = DIA.from_csr(A, dtype=jnp.float32, store_transpose=True)
    assert D.dataT is not None and D.dataT.shape[1] == D.ne == m
    x = rng.normal(size=m).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(D.matvec(jnp.asarray(x))), A @ x, rtol=2e-5
    )


def test_pallas_rmv_kernel_col_emb_interpret():
    """Restriction-like rectangular P^T r through the transpose kernel:
    coarse columns embedded into the 128-aligned fine row lattice."""
    import pytest

    from porotpu.ops import pallas_dia
    from porotpu.ops.dia import DIA

    if not pallas_dia.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(8)
    nf, nc = 1280, 150
    emb = np.sort(rng.choice(nf, size=nc, replace=False))
    rows, cols, vals = [], [], []
    for j in range(nc):
        i = np.clip(emb[j] + np.arange(-170, 171, 34), 0, nf - 1)
        rows.append(i)
        cols.append(np.full(i.size, j))
        vals.append(rng.normal(size=i.size))
    P = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nf, nc),
    )
    D = DIA.from_csr(P, dtype=jnp.float32, col_emb=emb)
    assert D.ne == D.nrows
    r = rng.normal(size=nf).astype(np.float32)
    y = np.asarray(
        pallas_dia.rmv(D.data, D.offsets, jnp.asarray(r), nf, interpret=True)
    )[np.asarray(D.col_emb)]
    ref = P.T @ r
    assert np.allclose(y, ref, atol=1e-4 * np.abs(ref).max())
