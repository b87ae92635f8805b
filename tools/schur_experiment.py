"""Schur-approximation shoot-out for the 2-way fieldsplit (host, scipy).

The round-2 robustness leak: with the Schur-lower fieldsplit and EXACT
sub-solves, swelling outer iterations still grow 9 -> 13 -> 23 over
N=10..40 — the selfp approximation S = App - Apf diag(Aff)^-1 Afp
degrades as the viscous term overtakes the Darcy drag (mu_f/h^2 vs
phi0^2/kf).  This experiment compares Schur solvers inside the SAME
block-lower 2-way PC, all other solves exact (scipy splu):

  selfp : LU of App - Apf diag(Aff)^-1 Afp      (PETSc selfp; reference)
  true  : LU of the dense true Schur complement (gold standard, small N)
  cc    : Cahouet-Chabard  y = Mcc^-1 r + Lcc^-1 r with the reference's
          beta_CC1/beta_CC2 scalings (lib/Assembler.py:118-138)
  cc+selfp : y = selfp^-1 r combined? (variants)

Usage: PORO_PLATFORM=cpu python tools/schur_experiment.py 10 20 40
"""

import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def fgmres(Aop, b, Mop, rtol=1e-6, atol=1e-8, maxiter=200):
    """Right-preconditioned FGMRES, unpreconditioned-residual stopping."""
    n = b.size
    V = np.zeros((maxiter + 1, n))
    Z = np.zeros((maxiter, n))
    H = np.zeros((maxiter + 1, maxiter))
    r0 = b.copy()
    beta = np.linalg.norm(r0)
    if beta == 0:
        return b * 0, 0
    V[0] = r0 / beta
    g = np.zeros(maxiter + 1)
    g[0] = beta
    cs = np.zeros(maxiter)
    sn = np.zeros(maxiter)
    for j in range(maxiter):
        Z[j] = Mop(V[j])
        w = Aop(Z[j])
        for i in range(j + 1):
            H[i, j] = V[i] @ w
            w -= H[i, j] * V[i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] > 0:
            V[j + 1] = w / H[j + 1, j]
        # Givens
        for i in range(j):
            t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
            H[i + 1, j] = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
            H[i, j] = t
        d = np.hypot(H[j, j], H[j + 1, j])
        cs[j], sn[j] = H[j, j] / d, H[j + 1, j] / d
        H[j, j] = d
        H[j + 1, j] = 0.0
        g[j + 1] = -sn[j] * g[j]
        g[j] = cs[j] * g[j]
        res = abs(g[j + 1])
        if res < max(atol, rtol * beta):
            j += 1
            break
    y = np.linalg.solve(H[:j, :j], g[:j])
    return Z[:j].T @ y, j


def run(N):
    from porotpu.models import benchmarks

    problem = benchmarks.swelling(
        Nelements=N,
        overrides={"pc type": "diagonal", "inner pc type": "hypre"},
        dtype=jnp.float64,
    )
    A, P, Pd, (bc_dofs, bc_vals) = problem._bc_applied_operators()
    ns, nf, npp = problem.padded_sizes
    n = problem.n_pad
    sl_s, sl_f, sl_p = slice(0, ns), slice(ns, ns + nf), slice(ns + nf, n)
    Acsr = A.tocsr()
    P_ss = P[sl_s, sl_s].tocsr()
    P_ff = P[sl_f, sl_f].tocsr()
    P_pp = P[sl_p, sl_p].tocsr()
    P_fp = P[sl_f, sl_p].tocsr()
    P_pf = P[sl_p, sl_f].tocsr()
    P_fs = P[sl_f, sl_s].tocsr()
    P_ps = P[sl_p, sl_s].tocsr()

    asm = problem.assembler
    pr = asm.pr
    phis, phi0 = asm.phis, asm.phi0
    idt, ks = asm.idt, asm.ks
    beta_CC1 = phi0 / (2.0 * asm.mu_f / asm.dim)
    beta_CC2 = 1.0 / (asm.rhof * idt / phi0 + asm.ikf)
    beta_p = asm.betap * phis**2 / (asm.dt * (2.0 * asm.mu_s / asm.dim + asm.lmbda))

    # CC pressure operators, padded to npp with identity rows like P_pp
    def pad_pp(M):
        Mp = sp.identity(npp, format="lil")
        Mp[: M.shape[0], : M.shape[1]] = M
        return Mp.tocsr()

    # pressure Dirichlet rows (match P_pp's BC surgery): detect identity rows
    Mcc = pad_pp((phis**2 * idt / ks) * pr.Mp + beta_CC1 * pr.Mp)
    Lcc = pad_pp((phis**2 * idt / ks) * pr.Mp + beta_CC2 * pr.Kp)
    # apply the same pressure BC rows as P_pp: rows where P_pp is identity
    from porotpu.fem.bcs import apply_bcs_matrix

    p_bc = bc_dofs[(bc_dofs >= ns + nf)] - (ns + nf)
    Mcc = apply_bcs_matrix(Mcc, p_bc)
    Lcc = apply_bcs_matrix(Lcc, p_bc)

    t0 = time.perf_counter()
    lu_s = spla.splu(P_ss.tocsc())
    lu_f = spla.splu(P_ff.tocsc())
    dff = P_ff.diagonal()
    S_selfp = (P_pp - P_pf @ sp.diags(1.0 / dff) @ P_fp).tocsc()
    lu_selfp = spla.splu(S_selfp)
    lu_m = spla.splu(Mcc.tocsc())
    lu_l = spla.splu(Lcc.tocsc())
    print(f"N={N} n={n} np={npp} factorizations {time.perf_counter()-t0:.1f}s",
          flush=True)

    def pc_apply(x, schur):
        xs, xf, xp = x[sl_s], x[sl_f], x[sl_p]
        ys = lu_s.solve(xs)
        rf = xf - P_fs @ ys
        rp = xp - P_ps @ ys
        yf = lu_f.solve(rf)
        rS = rp - P_pf @ yf
        yp = schur(rS)
        return np.concatenate([ys, yf, yp])

    schurs = {
        "selfp": lambda r: lu_selfp.solve(r),
        "cc": lambda r: lu_m.solve(r) + lu_l.solve(r),
    }

    # true Schur action (exact Aff solve) for inner-Krylov variants
    def S_action(v):
        return P_pp @ v - P_pf @ lu_f.solve(P_fp @ v)

    def schur_krylov(M, k):
        def apply(r):
            x, _ = fgmres(S_action, r, M, rtol=0.0, atol=0.0, maxiter=k)
            return x
        return apply

    schurs["selfp-k2"] = schur_krylov(lambda r: lu_selfp.solve(r), 2)
    schurs["selfp-k3"] = schur_krylov(lambda r: lu_selfp.solve(r), 3)
    schurs["cc-k2"] = schur_krylov(lambda r: lu_m.solve(r) + lu_l.solve(r), 2)
    schurs["cc-k3"] = schur_krylov(lambda r: lu_m.solve(r) + lu_l.solve(r), 3)
    for wm, wd in ((0.5, 1.0), (2.0, 1.0), (1.0, 0.5), (1.0, 2.0)):
        schurs[f"cc[{wm},{wd}]"] = (
            lambda r, wm=wm, wd=wd: wm * lu_m.solve(r) + wd * lu_l.solve(r)
        )

    # ---- discrete Cahouet-Chabard: selfp restricted to the mass+drag
    # diagonal of Aff (correct gamma^-1 Laplacian scaling, exact discrete
    # divergence/gradient operators + BC rows) + viscous mass term
    gamma = asm.rhof * idt * phi0 + (1.0 + asm.betaf) * phi0**2 * asm.ikf
    Mvf_diag = pad_ff = np.zeros(nf)
    Mvf = pr.Mv_f
    Mvf_diag[: Mvf.shape[0]] = Mvf.diagonal()
    Mvf_diag[Mvf.shape[0]:] = 1.0
    dmd = gamma * Mvf_diag
    dmd[dmd == 0] = 1.0
    S_md = (P_pp - P_pf @ sp.diags(1.0 / dmd) @ P_fp).tocsc()
    lu_md = spla.splu(S_md)
    # lumped pressure mass, padded, viscous scaling 1/beta_CC1
    mp_lump = np.ones(npp)
    mp_lump[: pr.Mp.shape[0]] = np.asarray(pr.Mp.sum(axis=1)).ravel()
    mp_lump[p_bc] = np.inf  # no mass contribution on Dirichlet pressure rows
    w_visc = 1.0 / beta_CC1
    schurs["dcc"] = lambda r: lu_md.solve(r) + w_visc * r / mp_lump
    schurs["dcc-x2"] = lambda r: lu_md.solve(r) + 2 * w_visc * r / mp_lump
    schurs["dcc-x.5"] = lambda r: lu_md.solve(r) + 0.5 * w_visc * r / mp_lump
    schurs["md-only"] = lambda r: lu_md.solve(r)
    dccx2 = lambda r: lu_md.solve(r) + 2 * w_visc * r / mp_lump
    schurs["dcc-x2-k2"] = schur_krylov(dccx2, 2)
    schurs["dcc-x2-k3"] = schur_krylov(dccx2, 3)

    # gold standard at small N: dense true Schur complement
    if npp <= 2000:
        t0 = time.perf_counter()
        Afp_d = P_fp.toarray()
        X = lu_f.solve(Afp_d)
        S_true = P_pp.toarray() - P_pf @ X
        Sinv = np.linalg.inv(S_true)
        schurs["true"] = lambda r: Sinv @ r
        print(f"  dense true Schur {time.perf_counter()-t0:.1f}s", flush=True)

    t = problem.t0 + problem.parameters["dt"]
    loads = problem.assembler.get_load_vector(t)
    b = np.zeros(n)
    b[problem.pad_index] = loads
    b[bc_dofs] = bc_vals
    for name, schur in schurs.items():
        if schur is None:
            continue
        x, it = fgmres(
            lambda v: Acsr @ v, b, lambda v: pc_apply(v, schur),
            rtol=1e-6, atol=1e-8, maxiter=200,
        )
        res = np.linalg.norm(b - Acsr @ x)
        print(f"  schur={name:7s} iters={it} |r|={res:.2e}", flush=True)


if __name__ == "__main__":
    for N in [int(a) for a in (sys.argv[1:] or ["10", "20", "40"])]:
        run(N)
