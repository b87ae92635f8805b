"""porotpu — a TPU-native sparse linear-algebra framework for poromechanics.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
``nabw/poroelasticity-linear-solvers`` (a PETSc/FEniCS research code for linear
solvers and preconditioners of the linearized poromechanics model of
Chapelle et al.).  See SURVEY.md at the repo root for the full capability map.

Layers (bottom → top), mirroring the reference's 4-layer stack:

- ``porotpu.ops``      sparse containers (CSR host / ELL device) and SpMV kernels
                       (jnp + Pallas) — replaces PETSc Mat/Vec.
- ``porotpu.solvers``  jitted Krylov solvers (CG, GMRES/FGMRES), Chebyshev,
                       AAR and Anderson acceleration — replaces PETSc KSP and
                       lib/AAR.py / lib/AndersonAcceleration.py.
- ``porotpu.precond``  inner approximate solves (Jacobi/Chebyshev/AMG/dense-LU)
                       and the physics-based block preconditioners — replaces
                       lib/Preconditioner.py + hypre/MUMPS.
- ``porotpu.fem``      structured meshes, P1/P2 Lagrange spaces, vectorized
                       assembly of the poromechanics forms, Dirichlet BCs —
                       replaces DOLFIN/FFC (reference: lib/Assembler.py,
                       lib/MeshCreation.py).
- ``porotpu.models``   time-stepping physics layer and the five benchmark
                       drivers — replaces lib/AbstractPhysics.py,
                       lib/Poromechanics.py and the driver scripts.
- ``porotpu.parallel`` device-mesh sharding of vectors/matrices and sharded
                       solvers over ICI — replaces MPI domain decomposition.
- ``porotpu.utils``    config/options/parser/printing/timers/checkpoint.
"""

__version__ = "0.1.0"


def _tune_host_allocator():
    """Keep large malloc arenas resident (first-touch page faults are ~100x
    more expensive than warm access in the microVM environments this runs
    in; without this, every large numpy temporary re-faults its pages).

    Equivalent to MALLOC_MMAP_THRESHOLD_/MALLOC_TRIM_THRESHOLD_ env vars,
    but applied at import time via mallopt(3).
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_host_allocator()

def _select_platform():
    """Honor PORO_PLATFORM=cpu|tpu.

    The hosting harness overrides JAX_PLATFORMS, so a plain env var is not
    enough to keep CPU-only runs (tests, setup-side tools, drivers on a
    busy device) off the single tunnel-attached TPU — the device admits one
    process at a time and a second silently blocks on the device lock.
    """
    import os

    plat = os.environ.get("PORO_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


_select_platform()
