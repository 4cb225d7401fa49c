#!/bin/bash
# Build the unmodified reference 2D solver (+ our timing driver) and measure
# ns/cell/step for the Taylor-vortex example. Writes MEASURED-baseline JSON
# lines to stdout. Usage: bash scripts/refbaseline/build_and_run.sh [scheme...]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/src
OUT=/tmp/refbaseline
mkdir -p "$OUT"

g++ -O3 -march=native -std=c++17 -DNDEBUG \
    -I"$HERE" -I"$REF/bimocq2D" \
    "$HERE/main_bench.cpp" "$REF/bimocq2D/BimocqSolver2D.cpp" "$REF/utils/writeBMP.cpp" \
    -o "$OUT/ref2d_bench" -ltbb 2> "$OUT/build.log" || { cat "$OUT/build.log"; exit 1; }

g++ -O3 -march=native -std=c++17 -DNDEBUG \
    -I"$HERE" -I"$REF/bimocq2D" \
    "$HERE/main_dump.cpp" "$REF/bimocq2D/BimocqSolver2D.cpp" "$REF/utils/writeBMP.cpp" \
    -o "$OUT/ref2d_dump" -ltbb 2>> "$OUT/build.log" || { cat "$OUT/build.log"; exit 1; }

# default 7 = BIMOCQ (BimocqSolver2D.h:18) — the advertised baseline scheme
for scheme in "${@:-7}"; do
    "$OUT/ref2d_bench" "$scheme" 2 20
done
