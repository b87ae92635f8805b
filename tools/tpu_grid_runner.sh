#!/usr/bin/env bash
# Serial TPU runner for the expensive robustness-grid cells (f64 drivers,
# like-for-like with the CPU cells; --solver-chunk 100 = the long-f64-
# program workaround, identical restart semantics — output/ANALYSIS.md §7).
# ONE cell at a time: the TPU tunnel is single-holder (CLAUDE.md).
set -u -o pipefail
OUTDIR=output
TF=${TF:-0.02}

run_case () {
    local DRIVER=$1 N=$2 OPTS=$3 PC=$4 OUT=$5
    echo "" >> $OUT
    echo "$DRIVER pc='$PC' N=$N opts=$OPTS" | tee -a $OUT
    if ! PORO_PC_TIMINGS=0 timeout ${CELL_TIMEOUT:-7000} python $DRIVER -N $N \
        --petsc-options $OPTS --pc-type "$PC" --time-final $TF \
        --solver-chunk 100 >> $OUT 2>&1; then
        echo "FAILED (driver exit nonzero)" | tee -a $OUT
    fi
    tail -2 $OUT | grep "Solved" || true
}

# 1. the reference-protocol hole: footing 3-way inexact N=80 (VERDICT #5)
run_case footing.py 80 petsc-options-inexact "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-inexact.out
# 2. quasi-exact validation cells vs dense-LU exact (footing 3-way 194/248)
run_case footing.py 10 petsc-options-exact-iterative "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-qexact.out
run_case footing.py 20 petsc-options-exact-iterative "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-qexact.out
# 3. footing 2-way quasi-exact (N=10 already measured on CPU: 25)
run_case footing.py 20 petsc-options-exact-iterative "undrained" $OUTDIR/robustness-2d-footing-2way-qexact.out
run_case footing.py 40 petsc-options-exact-iterative "undrained" $OUTDIR/robustness-2d-footing-2way-qexact.out
run_case footing.py 80 petsc-options-exact-iterative "undrained" $OUTDIR/robustness-2d-footing-2way-qexact.out
# 4. footing 3-way quasi-exact grid completion
run_case footing.py 40 petsc-options-exact-iterative "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-qexact.out
run_case footing.py 80 petsc-options-exact-iterative "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-qexact.out
# 5. swelling quasi-exact above the dense cap
run_case swelling.py 80 petsc-options-exact-iterative "diagonal" $OUTDIR/robustness-2d-swelling-2way-qexact.out
run_case swelling.py 80 petsc-options-exact-iterative "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way-qexact.out
run_case swelling.py 160 petsc-options-exact-iterative "diagonal" $OUTDIR/robustness-2d-swelling-2way-qexact.out
run_case swelling.py 160 petsc-options-exact-iterative "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way-qexact.out
echo "TPU GRID QUEUE DONE"
