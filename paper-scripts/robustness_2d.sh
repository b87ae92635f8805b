#!/usr/bin/env bash
# Robustness-vs-mesh-size sweep (reference paper-scripts/robustness_2d.sh):
# outer Krylov iterations must stay bounded as N grows, for
# {swelling, footing} x {2-way, 3-way} x {exact, inexact} inner solves.
# NOTE: Run from repo root.  Writes iteration logs into output/*.out.

set -u -o pipefail
DO_EXACT=${DO_EXACT:-true}
DO_INEXACT=${DO_INEXACT:-true}
DO_QEXACT=${DO_QEXACT:-true}
NS_SWELLING=${NS_SWELLING:-"10 20 40 80 160"}
NS_FOOTING=${NS_FOOTING:-"10 20 40 80"}
# The exact operating point is a DENSE-LU substitution for MUMPS
# (SURVEY.md §2.3): it is only honest while every block fits the dense
# cap (InnerConfig.lu_max_size = 20k dofs) — swelling N<=40, footing
# N<=20 (footing's local refinement reaches 126k dofs by N=40).
NS_SWELLING_EXACT=${NS_SWELLING_EXACT:-"10 20 40"}
NS_FOOTING_EXACT=${NS_FOOTING_EXACT:-"10 20"}
# Quasi-exact (petsc-options-exact-iterative): tight-iterative MUMPS
# substitute run over the FULL reference exact grid
# (reference robustness_2d.sh:26-42) — the overlap with the dense-LU
# cells above validates the substitution (ANALYSIS.md §6).
NS_SWELLING_QEXACT=${NS_SWELLING_QEXACT:-"10 20 40 80 160"}
NS_FOOTING_QEXACT=${NS_FOOTING_QEXACT:-"10 20 40 80"}
# iteration robustness is a per-step property: the first steps suffice
TF=${TF:-0.02}
export PORO_PLATFORM=${PORO_PLATFORM:-cpu}

OUTDIR=output
mkdir -p $OUTDIR

run_case () {
    local DRIVER=$1 N=$2 OPTS=$3 PC=$4 OUT=$5
    echo "" | tee -a $OUT
    echo "$DRIVER pc='$PC' N=$N opts=$OPTS" | tee -a $OUT
    # pipefail + marker: a crashed driver leaves a detectable FAILED cell
    if ! python $DRIVER -N $N --petsc-options $OPTS --pc-type "$PC" \
        --time-final $TF | tee -a $OUT; then
        echo "FAILED (driver exit nonzero)" | tee -a $OUT
    fi
}

if [ "$DO_EXACT" = true ]; then
    for N in $NS_SWELLING_EXACT; do
        run_case swelling.py $N petsc-options-exact "diagonal" $OUTDIR/robustness-2d-swelling-2way.out
        run_case swelling.py $N petsc-options-exact "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way.out
    done
    for N in $NS_FOOTING_EXACT; do
        run_case footing.py $N petsc-options-exact "undrained" $OUTDIR/robustness-2d-footing-2way.out
        run_case footing.py $N petsc-options-exact "undrained 3-way" $OUTDIR/robustness-2d-footing-3way.out
    done
fi

if [ "$DO_QEXACT" = true ]; then
    for N in $NS_SWELLING_QEXACT; do
        run_case swelling.py $N petsc-options-exact-iterative "diagonal" $OUTDIR/robustness-2d-swelling-2way-qexact.out
        run_case swelling.py $N petsc-options-exact-iterative "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way-qexact.out
    done
    for N in $NS_FOOTING_QEXACT; do
        run_case footing.py $N petsc-options-exact-iterative "undrained" $OUTDIR/robustness-2d-footing-2way-qexact.out
        run_case footing.py $N petsc-options-exact-iterative "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-qexact.out
    done
fi

if [ "$DO_INEXACT" = true ]; then
    for N in $NS_SWELLING; do
        run_case swelling.py $N petsc-options-inexact "diagonal" $OUTDIR/robustness-2d-swelling-2way-inexact.out
        run_case swelling.py $N petsc-options-inexact "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way-inexact.out
    done
    for N in $NS_FOOTING; do
        run_case footing.py $N petsc-options-inexact "undrained" $OUTDIR/robustness-2d-footing-2way-inexact.out
        run_case footing.py $N petsc-options-inexact "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-inexact.out
    done
fi
