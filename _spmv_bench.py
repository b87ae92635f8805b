import time, sys
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)

n, L = 57344, 64
rng = np.random.default_rng(0)
data = rng.normal(size=(n, L)).astype(np.float32)
# banded-ish cols like an FEM matrix
base = np.arange(n)[:, None]
off = rng.integers(-2000, 2000, size=(n, L))
cols = np.clip(base + off, 0, n - 1).astype(np.int32)
x = rng.normal(size=n).astype(np.float32)

d, c, xv = jnp.asarray(data), jnp.asarray(cols), jnp.asarray(x)

from porotpu.ops.spmv import ell_matvec
y1 = ell_matvec(d, c, xv); y1.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    y1 = ell_matvec(d, c, y1[:n])
y1.block_until_ready()
t_xla = (time.perf_counter() - t0) / 20
print(f"XLA gather: {t_xla*1e3:.3f} ms  ({n*L/t_xla:.3e} nnz/s)")

try:
    from porotpu.ops.pallas_spmv import ell_matvec_pallas
    y2 = ell_matvec_pallas(d, c, xv); y2.block_until_ready()
    err = float(jnp.max(jnp.abs(y2 - ell_matvec(d, c, xv))))
    t0 = time.perf_counter()
    for _ in range(20):
        y2 = ell_matvec_pallas(d, c, y2)
    y2.block_until_ready()
    t_pl = (time.perf_counter() - t0) / 20
    print(f"Pallas:     {t_pl*1e3:.3f} ms  ({n*L/t_pl:.3e} nnz/s)  maxerr={err:.2e}")
except Exception as e:
    print("pallas failed:", repr(e)[:500])

# also try one-hot matmul variant (MXU): segment into tiles?  and take_along_axis
def tak(d, c, x):
    return jnp.sum(d * jnp.take(x, c, axis=0, indices_are_sorted=False, unique_indices=False), axis=1)
tak_j = jax.jit(tak)
y3 = tak_j(d, c, xv); y3.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    y3 = tak_j(d, c, y3)
y3.block_until_ready()
print(f"take:       {(time.perf_counter()-t0)/20*1e3:.3f} ms")
