#!/usr/bin/env bash
# Fill the remaining robustness-grid cells (resumable companion to
# robustness_2d.sh — same run_case format, appends to the same logs):
#   - footing {2-way,3-way} inexact, N=10..80
#   - swelling 3-way inexact N=160 (truncated in an earlier run)
# Ordered smallest-first so results land incrementally.
set -u -o pipefail
TF=${TF:-0.02}
export PORO_PLATFORM=${PORO_PLATFORM:-cpu}
OUTDIR=output
mkdir -p $OUTDIR

run_case () {
    local DRIVER=$1 N=$2 OPTS=$3 PC=$4 OUT=$5
    echo "" | tee -a $OUT
    echo "$DRIVER pc='$PC' N=$N opts=$OPTS" | tee -a $OUT
    # pipefail + explicit marker: a crashed/killed driver must leave a
    # detectable FAILED cell, not a silently truncated log entry
    if ! python $DRIVER -N $N --petsc-options $OPTS --pc-type "$PC" \
        --time-final $TF | tee -a $OUT; then
        echo "FAILED (driver exit nonzero)" | tee -a $OUT
    fi
}

for N in 10 20; do
    run_case footing.py $N petsc-options-inexact "undrained" $OUTDIR/robustness-2d-footing-2way-inexact.out
    run_case footing.py $N petsc-options-inexact "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-inexact.out
done
run_case swelling.py 160 petsc-options-inexact "diagonal 3-way" $OUTDIR/robustness-2d-swelling-3way-inexact.out
for N in 40 80; do
    run_case footing.py $N petsc-options-inexact "undrained" $OUTDIR/robustness-2d-footing-2way-inexact.out
    run_case footing.py $N petsc-options-inexact "undrained 3-way" $OUTDIR/robustness-2d-footing-3way-inexact.out
done
