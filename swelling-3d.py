#!/usr/bin/env python3
"""3D swelling benchmark driver — the scaling target.

TPU-native counterpart of the reference driver of the same name
(ks=1e8, maxiter 100, roller BCs per face).

Usage:
    python swelling-3d.py -N 10 --pc-type "diagonal" [--petsc-options FILE]
"""

from porotpu.models import benchmarks
from porotpu.utils.parser import Parser


def main():
    parser = Parser()
    N = parser.options.N or 10
    refinements = parser.options.refinements or 0
    problem = benchmarks.swelling_3d(N, refinements, parser=parser)
    problem.solve()
    problem.print_timings()


if __name__ == "__main__":
    main()
