"""SpMV format shoot-out on the real TPU (v5e) — decides the round-2 format.

METHODOLOGY: the axon tunnel has a ~2ms dispatch RTT and pipelined dispatch
hides sub-RTT kernels, so per-call timing lies.  Every candidate is measured
as K chained applications inside ONE jitted lax.fori_loop (single dispatch);
on-device per-op time = (total - rtt) / K.

Run:  python tools/bench_formats.py   (real TPU; ONE process at a time)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RTT = 0.0


def timeit_loop(step, x0, K=100):
    """Time K chained applications of step inside one jitted fori_loop."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, x: step(x), x)

    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x0)
    jax.block_until_ready(y)
    t1 = time.perf_counter()
    y = run(x0)
    jax.block_until_ready(y)
    t2 = time.perf_counter()
    return (min(t1 - t0, t2 - t1) - RTT) / K


def measure_rtt():
    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(8, jnp.float32)
    y = nop(x)
    jax.block_until_ready(y)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(nop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    global RTT
    log("devices:", jax.devices())
    RTT = measure_rtt()
    log(f"dispatch RTT: {RTT*1e3:.2f} ms")
    rng = np.random.default_rng(0)

    # ---------------- HBM stream roofline ----------------
    big = jnp.asarray(rng.normal(size=(32 * 1024 * 1024 // 4,)).astype(np.float32))
    t = timeit_loop(lambda x: x * 1.000001, big, K=50)
    log(f"8. HBM stream 32MB r+w:   {t*1e3:8.3f} ms   {2*big.size*4/t/1e9:.0f} GB/s")

    # ---------------- 1. ELL gather ----------------
    n, L = 27783, 191
    data = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32) * 1e-3)
    base = np.arange(n)[:, None]
    off = rng.integers(-1400, 1400, size=(n, L))
    cols = jnp.asarray(np.clip(base + off, 0, n - 1).astype(np.int32))
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    t = timeit_loop(lambda x: jnp.sum(data * x[cols], axis=1), x0, K=20)
    log(f"1. ELL gather n=28k L=191:{t*1e3:8.3f} ms   {n*L/t/1e9:.3f} Gnnz/s")

    # small (coarse-level scale)
    nc, Lc = 4096, 100
    datac = jnp.asarray(rng.normal(size=(nc, Lc)).astype(np.float32) * 1e-3)
    colsc = jnp.asarray(rng.integers(0, nc, size=(nc, Lc)).astype(np.int32))
    xc = jnp.asarray(rng.normal(size=nc).astype(np.float32))
    t = timeit_loop(lambda x: jnp.sum(datac * x[colsc], axis=1), xc, K=20)
    log(f"1b. ELL gather n=4k L=100:{t*1e3:8.3f} ms   {nc*Lc/t/1e9:.3f} Gnnz/s")

    # ---------------- 2. DIA ----------------
    for npad, nds in ((27904, (128, 384)), (115328, (128, 384))):
        halo = 4096
        for nd in nds:
            bands = jnp.asarray(
                rng.normal(size=(nd, npad)).astype(np.float32) * (2.0 / nd)
            )
            offs = tuple(int(v) for v in np.sort(rng.integers(0, 2 * halo, size=nd)))

            def step(x, bands=bands, offs=offs, npad=npad, halo=halo):
                xpad = jnp.pad(x, (halo, halo))
                y = jnp.zeros(npad, dtype=jnp.float32)
                for d in range(len(offs)):
                    y = y + bands[d] * jax.lax.dynamic_slice(
                        xpad, (offs[d],), (npad,)
                    )
                return y

            xx = jnp.asarray(rng.normal(size=npad).astype(np.float32))
            t = timeit_loop(step, xx, K=20)
            gb = bands.size * 4 / t / 1e9
            log(
                f"2. DIA n={npad:6d} nd={nd:3d}: {t*1e3:8.3f} ms   "
                f"{npad*nd/t/1e9:.3f} Gnnz/s  {gb:.0f} GB/s(bands)"
            )

    # ---------------- 6. bf16 DIA ----------------
    npad, nd, halo = 115328, 384, 4096
    bands16 = jnp.asarray(
        (rng.normal(size=(nd, npad)) * (2.0 / nd)).astype(np.float32)
    ).astype(jnp.bfloat16)
    offs = tuple(int(v) for v in np.sort(rng.integers(0, 2 * halo, size=nd)))

    def step16(x):
        xpad = jnp.pad(x, (halo, halo)).astype(jnp.bfloat16)
        y = jnp.zeros(npad, dtype=jnp.float32)
        for d in range(nd):
            w = jax.lax.dynamic_slice(xpad, (offs[d],), (npad,))
            y = y + (bands16[d] * w).astype(jnp.float32)
        return y

    xx = jnp.asarray(rng.normal(size=npad).astype(np.float32))
    t = timeit_loop(step16, xx, K=20)
    log(f"6. DIA bf16 n=115k nd=384:{t*1e3:8.3f} ms   {npad*nd/t/1e9:.3f} Gnnz/s")

    # ---------------- 4. dense matvec (coarse solves) ----------------
    for m in (1024, 2048, 4096, 8192):
        A = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32) / m)
        v0 = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
        t = timeit_loop(lambda v: A @ v, v0, K=50)
        log(f"4. dense matvec {m:5d}:    {t*1e3:8.3f} ms   {m*m*4/t/1e9:.0f} GB/s")

    # ---------------- 5. conv3d stencil (matrix-free) ----------------
    for g, c in ((21, 3), (41, 3)):
        k = jnp.asarray(rng.normal(size=(5, 5, 5, c, c)).astype(np.float32) * 1e-2)

        def conv(x, k=k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        xg = jnp.asarray(rng.normal(size=(1, g, g, g, c)).astype(np.float32))
        t = timeit_loop(conv, xg, K=50)
        eff_nnz = g**3 * c * 125 * c
        log(f"5. conv3d {g}^3x{c} 5^3 st: {t*1e3:8.3f} ms   {eff_nnz/t/1e9:.2f} Gnnz/s-equiv")

    # ---------------- 7. scatter-add (rmatvec / restriction) ----------
    m = 27783
    idx = jnp.asarray(rng.integers(0, m, size=(m * 30,)).astype(np.int32))

    def scat(x):
        contrib = jnp.broadcast_to(x[:, None] * 1e-3, (m, 30)).ravel()
        return jnp.zeros(m, jnp.float32).at[idx].add(contrib)

    t = timeit_loop(scat, jnp.asarray(rng.normal(size=m).astype(np.float32)), K=10)
    log(f"7. scatter-add 830k:      {t*1e3:8.3f} ms   {m*30/t/1e9:.3f} Gel/s")


if __name__ == "__main__":
    main()
