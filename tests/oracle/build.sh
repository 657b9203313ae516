#!/bin/bash
# Build the oracle dump harness against the read-only reference mount.
# The reference's Makefile flags are -Wall -Werror -std=c++17 -O3
# (/root/reference/Makefile:2-5); we keep -O3 so floating-point behavior
# matches the measured baseline binary.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/sift_oracle}
mkdir -p "$OUT"
g++ -O3 -std=c++17 -I "$REF/src" \
    "$(dirname "$0")/harness.cpp" \
    "$REF/src/image_io.cpp" "$REF/src/image.cpp" \
    -o "$OUT/oracle"
echo "built $OUT/oracle"
