"""Export (XDMF/VTU) and checkpoint/resume tests."""

import os

import numpy as np

import jax.numpy as jnp

from porotpu.models import benchmarks
from porotpu.utils.io import XDMFWriter, TimeSeriesWriter, load_checkpoint, save_checkpoint


def test_xdmf_roundtrip(tmp_path):
    import h5py

    problem = benchmarks.swelling(
        Nelements=3, overrides={"inner pc type": "lu"}
    )
    problem.solve_time_step(0.1)
    base = str(tmp_path / "swell")
    w = XDMFWriter(base, problem.mesh)
    w.write(0.1, problem.solution_fields())
    w.write(0.2, problem.solution_fields())
    w.close()
    assert os.path.exists(base + ".xdmf")
    with h5py.File(base + ".h5") as f:
        assert "mesh/vertices" in f
        assert "step_000000/displacement" in f
        disp = f["step_000000/displacement"][...]
        assert disp.shape == (problem.mesh.num_vertices, 2)
        assert np.all(np.isfinite(disp))


def test_vtu_writer(tmp_path):
    problem = benchmarks.swelling(
        Nelements=3, overrides={"inner pc type": "lu"}
    )
    problem.solve_time_step(0.1)
    base = str(tmp_path / "swell")
    w = TimeSeriesWriter(base, problem.mesh)
    w.write(0.1, problem.solution_fields())
    assert os.path.exists(base + "_000000.vtu")
    assert os.path.exists(base + ".pvd")


def test_checkpoint_resume(tmp_path):
    ov = {"inner pc type": "lu", "tf": 0.2}
    p1 = benchmarks.swelling(Nelements=3, overrides=dict(ov))
    p1.solve()  # 2 steps
    ck = str(tmp_path / "state.npz")
    save_checkpoint(ck, p1, p1.t)

    p2 = benchmarks.swelling(Nelements=3, overrides=dict(ov))
    t = load_checkpoint(ck, p2)
    assert t == p1.t
    assert np.allclose(np.asarray(p2.us_nm1), np.asarray(p1.us_nm1))
    # continue stepping from restored state: matches continuing p1
    its1 = p1.solve_time_step(p1.t + 0.1)
    its2 = p2.solve_time_step(p2.t + 0.1)
    assert its1 == its2
    assert np.allclose(
        np.asarray(p1.sol), np.asarray(p2.sol), rtol=1e-10, atol=1e-12
    )


def test_solver_state_cache(tmp_path):
    ov = {"inner pc type": "lu"}
    p1 = benchmarks.swelling(Nelements=3, overrides=dict(ov))
    p1.create_solver()
    p1.first_timestep = False
    path = str(tmp_path / "ops.pkl")
    p1.save_solver_cache(path)
    its1 = p1.solve_time_step(0.1)

    p2 = benchmarks.swelling(Nelements=3, overrides=dict(ov))
    assert p2.try_load_solver_cache(path)
    its2 = p2.solve_time_step(0.1)
    assert its1 == its2
    assert np.allclose(np.asarray(p1.sol), np.asarray(p2.sol))

def test_corrupt_and_stale_cache_rebuilds(tmp_path):
    """A stale-schema or corrupted cache must silently miss, never crash
    (round-1 BENCH_r01 crashed on a stale unversioned pickle)."""
    import pickle

    from porotpu.utils import cache

    ov = {"inner pc type": "lu"}
    p1 = benchmarks.swelling(Nelements=3, overrides=dict(ov))
    path = str(tmp_path / "ops.pkl")

    # 1. garbage bytes
    with open(path, "wb") as fh:
        fh.write(b"not a pickle at all")
    assert not p1.try_load_solver_cache(path)

    # 2. valid pickle, wrong schema tag
    with open(path, "wb") as fh:
        pickle.dump({"schema": "ancient", "tree": {}}, fh)
    assert cache.load(path) is None
    assert not p1.try_load_solver_cache(path)

    # 3. right schema, wrong payload layout (simulates a pytree refactor)
    with open(path, "wb") as fh:
        pickle.dump({"schema": cache.SCHEMA, "tree": {"A_dev": 1}}, fh)
    assert not p1.try_load_solver_cache(path)

    # after all misses the problem still sets up and solves
    p1.create_solver()
    p1.first_timestep = False
    assert p1.solve_time_step(0.1) >= 1
