"""Micro-benchmarks of SpMV primitive strategies on the real TPU.

Measures, at realistic problem shapes (swelling-3d N=10 solid block:
n=27783 rows, L~191 nnz/row):

1. ELL gather SpMV (current production path): y = sum(data * x[cols], 1)
2. Pallas ELL (VMEM-resident x, on-chip gather) if it lowers
3. Stencil-DIA SpMV: y = sum_d band_d * xpad[off_d : off_d+n] (no gather)
4. scatter-add (ELL rmatvec / FEM scatter cost)
5. batched small dense matmul (matrix-free element-kernel alternative)

Run: python tools/tpu_microbench.py   (on the TPU; one process at a time)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, reps=20):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    n, L = 27783, 191
    npad = 27904  # 218*128

    # --- 1. ELL gather ---
    data = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32))
    base = np.arange(n)[:, None]
    off = rng.integers(-1400, 1400, size=(n, L))
    colsnp = np.clip(base + off, 0, n - 1).astype(np.int32)
    cols = jnp.asarray(colsnp)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))

    f_ell = jax.jit(lambda d, c, x: jnp.sum(d * x[c], axis=1))
    t = timeit(f_ell, data, cols, x, reps=5)
    log(f"1. ELL gather:        {t*1e3:9.3f} ms   {n*L/t:.3e} nnz/s")

    # 1b. take_along_axis on a windowed x replicated per row-tile? skip.
    # 1c. one-hot matmul gather for the small pressure block scale
    npv = 1331
    xs = jnp.asarray(rng.normal(size=npv).astype(np.float32))
    colS = jnp.asarray(rng.integers(0, npv, size=(npv, 15)).astype(np.int32))
    dataS = jnp.asarray(rng.normal(size=(npv, 15)).astype(np.float32))
    t = timeit(f_ell, dataS, colS, xs, reps=20)
    log(f"1c. small ELL gather: {t*1e3:9.3f} ms   {npv*15/t:.3e} nnz/s")

    # (a Pallas ELL-gather kernel was measured here historically; DIA made
    # gathers obsolete on the production path and the kernel was removed)

    # --- 3. stencil DIA: nd diagonals, shifts of a padded x ---
    for nd in (64, 125):
        bands = jnp.asarray(rng.normal(size=(nd, npad)).astype(np.float32))
        halo = 2048
        xpad = jnp.asarray(rng.normal(size=npad + 2 * halo).astype(np.float32))
        offs = tuple(int(v) for v in rng.integers(0, 2 * halo, size=nd))

        def dia_mv(bands, xpad):
            y = jnp.zeros(npad, dtype=jnp.float32)
            for d in range(nd):
                y = y + bands[d] * jax.lax.dynamic_slice(xpad, (offs[d],), (npad,))
            return y

        f_dia = jax.jit(dia_mv)
        t = timeit(f_dia, bands, xpad, reps=10)
        log(f"3. DIA nd={nd:3d}:       {t*1e3:9.3f} ms   {npad*nd/t:.3e} nnz/s")

    # 3b. DIA as 2D: bands (nd, npad) with x as gathered windows via conv?
    # 3c. DIA batched over 9 component pairs (3x3 vector block)
    nd = 125
    M = 9261
    Mpad = 9344  # 73*128
    bands9 = jnp.asarray(rng.normal(size=(3, 3, nd, Mpad)).astype(np.float32))
    xpad3 = jnp.asarray(rng.normal(size=(3, Mpad + 2 * 2048)).astype(np.float32))
    offs = tuple(int(v) for v in rng.integers(0, 2 * 2048, size=nd))

    def dia9(bands9, xpad3):
        # windows: (3, nd, Mpad) shifted copies
        wins = jnp.stack(
            [jax.lax.dynamic_slice(xpad3, (0, offs[d]), (3, Mpad)) for d in range(nd)],
            axis=1,
        )
        # y[ci] = sum_cj sum_d bands9[ci,cj,d] * wins[cj,d]
        return jnp.einsum("ijdm,jdm->im", bands9, wins)

    f9 = jax.jit(dia9)
    t = timeit(f9, bands9, xpad3, reps=10)
    log(f"3c. DIA 3x3 block:    {t*1e3:9.3f} ms   {9*Mpad*nd/t:.3e} nnz/s")

    # --- 4. scatter-add ---
    contrib = jnp.asarray(rng.normal(size=(n * 30,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(n * 30,)).astype(np.int32))

    f_sc = jax.jit(lambda c, i: jnp.zeros(n, jnp.float32).at[i].add(c))
    t = timeit(f_sc, contrib, idx, reps=5)
    log(f"4. scatter-add:       {t*1e3:9.3f} ms   {n*30/t:.3e} el/s")

    # --- 5. batched dense matmul (element kernels) ---
    ne = 6000
    Ke = jnp.asarray(rng.normal(size=(ne, 30, 30)).astype(np.float32))
    xe = jnp.asarray(rng.normal(size=(ne, 30)).astype(np.float32))
    f_mm = jax.jit(lambda K, v: jnp.einsum("eij,ej->ei", K, v))
    t = timeit(f_mm, Ke, xe, reps=20)
    log(f"5. batched 30x30 mm:  {t*1e3:9.3f} ms   {ne*900*2/t:.3e} flop/s")

    # --- 6. dense matmul reference (MXU roofline probe) ---
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    f_dense = jax.jit(lambda a, b: a @ b)
    t = timeit(f_dense, A, B, reps=5)
    log(f"6. 4096^3 matmul:     {t*1e3:9.3f} ms   {2*4096**3/t:.3e} flop/s")


if __name__ == "__main__":
    main()
