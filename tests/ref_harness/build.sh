#!/bin/bash
# Build the reference counter (with shims for its empty git submodules) and
# the golden_dump harness. Outputs land in /root/repo/ref_build (gitignored).
set -euo pipefail
REF=/root/reference
REPO=/root/repo
OUT=$REPO/ref_build
SHIM=$REPO/tests/ref_harness/shim
mkdir -p "$OUT"

CXXFLAGS="-O3 -march=native -std=gnu++17 -w"

# Reference counter app (baseline measurement). Shim dir provides kff_io.hpp
# and ankerl/unordered_dense.h (empty submodules in the snapshot).
g++ $CXXFLAGS -fopenmp \
    -I "$SHIM" -I "$REF/brisk" -I "$REF/apps" \
    "$REF/apps/counter.cpp" "$REF/brisk/Kmers.cpp" \
    "$REF/brisk/hashing.cpp" "$REF/brisk/Decycling.cpp" \
    -lz -o "$OUT/ref_counter"

# Golden per-kmer count dumper (mode-2 oracle semantics).
g++ $CXXFLAGS \
    -I "$REF/brisk" \
    "$REPO/tests/ref_harness/golden_dump.cpp" "$REF/brisk/Kmers.cpp" \
    "$REF/brisk/hashing.cpp" "$REF/brisk/Decycling.cpp" \
    -o "$OUT/golden_dump"

echo "built: $OUT/ref_counter $OUT/golden_dump"
