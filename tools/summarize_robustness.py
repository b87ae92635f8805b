"""Summarize the robustness sweep logs into an iterations-vs-N table.

Parses output/robustness-2d-*.out (written by paper-scripts/robustness_2d.sh,
mirroring reference paper-scripts/robustness_2d.sh:24-71) and prints a
markdown table: rows = (problem, pc, operating point), columns = N.

Usage: python tools/summarize_robustness.py [> output/SUMMARY.md]
"""

import glob
import os
import re
import sys


def parse(path):
    """Return {N: iterations} for one sweep log (last step of each run)."""
    runs = {}
    n = None
    for line in open(path):
        m = re.match(r"\S+\.py pc='.*' N=(\d+) opts=(\S+)", line)
        if m:
            n = int(m.group(1))
            continue
        m = re.search(r"Solved time t=[\d.]+\. (\d+) iterations", line)
        if m and n is not None:
            runs[n] = int(m.group(1))  # keep the last step's count
    return runs


def main():
    rows = []
    all_ns = set()
    for path in sorted(glob.glob("output/robustness-2d-*.out")):
        name = os.path.basename(path)[len("robustness-2d-"):-len(".out")]
        runs = parse(path)
        if not runs:
            continue
        all_ns.update(runs)
        rows.append((name, runs))
    ns = sorted(all_ns)
    print("# Robustness sweep: outer Krylov iterations vs mesh size N")
    print()
    header = "| case | " + " | ".join(f"N={n}" for n in ns) + " |"
    print(header)
    print("|" + "---|" * (len(ns) + 1))
    for name, runs in rows:
        cells = [str(runs.get(n, "—")) for n in ns]
        print(f"| {name} | " + " | ".join(cells) + " |")
    print()
    print("(exact = dense-LU inner solves, run for N<=40 — the documented")
    print("MUMPS substitution, SURVEY.md §2.3; inexact = AMG-preconditioned")
    print("fixed-iteration inner solves, petsc-options-inexact; qexact =")
    print("quasi-exact tight-iterative inner solves — 60 V-cycle-CG")
    print("iterations per block, fp block solved by fieldsplit-preconditioned")
    print("FGMRES to ~1e-12 — petsc-options-exact-iterative, validated")
    print("against the dense-LU cells in ANALYSIS.md §6.)")


if __name__ == "__main__":
    main()
