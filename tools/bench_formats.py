"""SpMV format shoot-out on the real TPU (v5e) — decides the round-2 format.

METHODOLOGY:
- the axon tunnel has dispatch RTT and pipelined dispatch hides sub-RTT
  kernels, so per-call timing lies.  Every candidate is K chained
  applications inside ONE jitted lax.fori_loop (single dispatch);
  per-op time = (total - rtt) / K.
- operands are jit ARGUMENTS (closure constants get baked into the
  executable, shipped with the compile RPC, and distort everything).

Run:  python tools/bench_formats.py   (real TPU; ONE process at a time)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RTT = 0.0
_seed_counter = [0]


def _timed_runs(step, ops, x0, K):
    """min wall time of a K-iteration chained loop, defeating the axon
    runtime's result memoization by feeding a fresh noise scalar per call."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(ops, x, noise, k):
        x = x + noise * 1e-30  # ties the fresh input into the chain
        return jax.lax.fori_loop(0, k, lambda i, x: step(ops, x), x)

    def fresh():
        _seed_counter[0] += 1
        return jnp.float32(_seed_counter[0])

    def sync(y):
        # block_until_ready does NOT synchronize on the axon backend; the
        # only reliable barrier is fetching result bytes to the host.
        return np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

    sync(run(ops, x0, fresh(), K))  # compile
    ts = []
    for _ in range(3):
        noise = fresh()
        t0 = time.perf_counter()
        sync(run(ops, x0, noise, K))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit_loop(step, ops, x0, K=50):
    """Per-op time via the difference between 3K- and K-iteration loops:
    cancels dispatch RTT, per-call constant upload, and any fixed costs."""
    t1 = _timed_runs(step, ops, x0, K)
    t3 = _timed_runs(step, ops, x0, 3 * K)
    return max(t3 - t1, 1e-9) / (2 * K)


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # ------------- 0. loop-overhead probes -------------
    small = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    t = timeit_loop(lambda o, x: x + 1.0, None, small, K=200)
    log(f"0a. loop body x+1 (1KB):  {t*1e6:9.1f} us/iter")

    med = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))
    t = timeit_loop(lambda o, x: jnp.roll(x, 1, axis=0) + 1.0, None, med, K=200)
    log(f"0b. roll+1 (512KB):       {t*1e6:9.1f} us/iter")

    # chain of 16 dependent elementwise ops (fusion-friendly)
    def chain16(o, x):
        for _ in range(16):
            x = x * 1.000001 + 1e-9
        return jnp.roll(x, 1, axis=0)

    t = timeit_loop(chain16, None, med, K=100)
    log(f"0c. 16-op chain (512KB):  {t*1e6:9.1f} us/iter")

    # ------------- 1. ELL gather (args) -------------
    n, L = 27783, 191
    data = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32) * 1e-3)
    base = np.arange(n)[:, None]
    cols = jnp.asarray(
        np.clip(base + rng.integers(-1400, 1400, size=(n, L)), 0, n - 1).astype(
            np.int32
        )
    )
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    t = timeit_loop(
        lambda o, x: jnp.sum(o[0] * x[o[1]], axis=1), (data, cols), x0, K=10
    )
    log(f"1. ELL gather n=28k L=191:{t*1e3:9.3f} ms  {n*L/t/1e9:.3f} Gnnz/s")

    # ------------- 2. DIA 1-D slices (args) -------------
    halo = 4096
    for npad, nd in ((27904, 128), (27904, 384), (115328, 384)):
        bands = jnp.asarray(rng.normal(size=(nd, npad)).astype(np.float32) * (2.0 / nd))
        offs = tuple(int(v) for v in np.sort(rng.integers(0, 2 * halo, size=nd)))

        def step(b, x, offs=offs, npad=npad):
            xpad = jnp.pad(x, (halo, halo))
            y = jnp.zeros(npad, dtype=jnp.float32)
            for d in range(len(offs)):
                y = y + b[d] * jax.lax.dynamic_slice(xpad, (offs[d],), (npad,))
            return y

        xx = jnp.asarray(rng.normal(size=npad).astype(np.float32))
        t = timeit_loop(step, bands, xx, K=20)
        log(
            f"2. DIA1d n={npad:6d} nd={nd:3d}:{t*1e3:9.3f} ms  "
            f"{npad*nd/t/1e9:.2f} Gnnz/s  {bands.size*4/t/1e9:.0f} GB/s"
        )

    # ------------- 3. DIA 2-D blocked (sublane slices) -------------
    # x laid out (m + 2h, 128): column l holds dofs [l*m - h, (l+1)*m + h);
    # slice per diagonal is along axis 0 only (no lane crossing).
    for m, nd in ((218, 128), (218, 384), (901, 384)):
        npad = m * 128
        h = 128  # sublane halo; lattice offsets are < h after blocking? no:
        # offsets up to +-4096 dofs need h >= 4096/1?? In this layout a dof
        # offset o maps to a SUBLANE offset o (same column) — halo must
        # cover max |o|. Use h = 1024 and offsets within +-1024.
        h = 1024
        bands2 = jnp.asarray(
            rng.normal(size=(nd, m, 128)).astype(np.float32) * (2.0 / nd)
        )
        offs = tuple(int(v) for v in np.sort(rng.integers(0, 2 * h, size=nd)))

        def step2(b, x, offs=offs, m=m, h=h):
            # x: (m, 128). build halo'd copy (m+2h, 128): column l needs
            # dofs of columns l-1/l+1 edges — approximate with roll (cost
            # model only; correctness wiring comes later)
            top = jnp.roll(x, 1, axis=1)[-h:, :]
            bot = jnp.roll(x, -1, axis=1)[:h, :]
            X = jnp.concatenate([top, x, bot], axis=0)  # (m+2h, 128)
            y = jnp.zeros_like(x)
            for d in range(len(offs)):
                y = y + b[d] * jax.lax.dynamic_slice(X, (offs[d], 0), (m, 128))
            return y

        xx = jnp.asarray(rng.normal(size=(m, 128)).astype(np.float32))
        t = timeit_loop(step2, bands2, xx, K=20)
        log(
            f"3. DIA2d n={npad:6d} nd={nd:3d}:{t*1e3:9.3f} ms  "
            f"{npad*nd/t/1e9:.2f} Gnnz/s  {bands2.size*4/t/1e9:.0f} GB/s"
        )

    # ------------- 4. dense matvec (args) -------------
    for mm in (1024, 2048, 4096, 8192):
        A = jnp.asarray(rng.normal(size=(mm, mm)).astype(np.float32) / mm)
        v0 = jnp.asarray(rng.normal(size=(mm,)).astype(np.float32))
        t = timeit_loop(lambda A, v: A @ v, A, v0, K=50)
        log(f"4. dense mv {mm:5d}:       {t*1e3:9.3f} ms  {mm*mm*4/t/1e9:.0f} GB/s")

    # ------------- 5. conv3d stencil (args) -------------
    for g, c in ((21, 3), (41, 3)):
        k = jnp.asarray(rng.normal(size=(5, 5, 5, c, c)).astype(np.float32) * 1e-2)

        def conv(k, x):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        xg = jnp.asarray(rng.normal(size=(1, g, g, g, c)).astype(np.float32))
        t = timeit_loop(conv, k, xg, K=50)
        eff = g**3 * c * 125 * c
        log(f"5. conv3d {g}^3x{c}:        {t*1e3:9.3f} ms  {eff/t/1e9:.2f} Gnnz/s-eq")

    # ------------- 7. scatter-add (args) -------------
    m = 27783
    idx = jnp.asarray(rng.integers(0, m, size=(m * 30,)).astype(np.int32))

    def scat(idx, x):
        contrib = jnp.broadcast_to(x[:, None] * 1e-3, (m, 30)).ravel()
        return jnp.zeros(m, jnp.float32).at[idx].add(contrib)

    t = timeit_loop(scat, idx, jnp.asarray(rng.normal(size=m).astype(np.float32)), K=5)
    log(f"7. scatter-add 830k:      {t*1e3:9.3f} ms  {m*30/t/1e9:.3f} Gel/s")


if __name__ == "__main__":
    main()
