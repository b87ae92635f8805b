"""Smoke tests for the five CLI drivers (run in-process on the CPU backend).

Each driver is exec'd with a tiny mesh; pass criterion mirrors the
reference's de-facto testing strategy (SURVEY.md §4: drivers as
integration tests, convergence as the oracle).
"""

import runpy
import sys

import pytest


def _run_driver(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize(
    "script,args",
    [
        ("footing.py", ["-N", "4"]),
        ("swelling.py", ["-N", "4"]),
        ("swelling-3d.py", ["-N", "2"]),
        ("solid.py", ["-N", "3"]),
        ("fluid-pressure.py", ["-N", "3"]),
    ],
)
def test_driver_smoke(script, args):
    _run_driver(script, args)


def test_driver_with_options_files():
    _run_driver("swelling.py", ["-N", "4", "--petsc-options", "petsc-options-exact"])
    _run_driver(
        "footing.py",
        ["-N", "4", "--petsc-options", "petsc-options-inexact",
         "--pc-type", "undrained"],
    )


def test_driver_3way_pc():
    _run_driver(
        "swelling.py",
        ["-N", "4", "--pc-type", "diagonal 3-way",
         "--petsc-options", "petsc-options-exact"],
    )
