#!/usr/bin/env python3
"""2D footing consolidation benchmark driver.

TPU-native counterpart of the reference driver of the same name: ramped
strip load on the locally-refined top-center of a 64x64 square, full
3-field solve with the "undrained" 2-way block preconditioner by default.

Usage (reference CLI parity, lib/Parser.py:15-36):
    python footing.py -N 10 --pc-type "undrained" [--petsc-options FILE]
"""

from porotpu.models import benchmarks
from porotpu.utils.parser import Parser


def main():
    parser = Parser()
    N = parser.options.N or 10
    refinements = parser.options.refinements or 0
    problem = benchmarks.footing(N, refinements, parser=parser)
    problem.solve()
    problem.print_timings()


if __name__ == "__main__":
    main()
