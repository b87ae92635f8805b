#!/usr/bin/env python3
"""2D swelling benchmark driver (the paper's main 2D case).

TPU-native counterpart of the reference driver of the same name: 90/10
solid/fluid split of a ramped boundary traction on a 1e-2 square,
symmetry BCs, "diagonal" block preconditioner by default.

Usage:
    python swelling.py -N 10 --pc-type "diagonal" [--petsc-options FILE]
"""

from porotpu.models import benchmarks
from porotpu.utils.parser import Parser


def main():
    parser = Parser()
    N = parser.options.N or 10
    refinements = parser.options.refinements or 0
    problem = benchmarks.swelling(N, refinements, parser=parser)
    problem.solve()
    problem.print_timings()


if __name__ == "__main__":
    main()
