#!/bin/sh
# Build the reference chromap binary (read-only tree at /root/reference)
# out-of-tree into /tmp/refbuild, so that
#   * bench.py can run the reference in the same process phase
#     (extra.reference_same_run_reads_per_s), and
#   * tools/differential_fuzz.py can re-run the randomized differential
#     campaign from a clean checkout:
#       sh tools/build_reference.sh && \
#       CHROMAP_TPU_RUN_DIFFERENTIAL=1 python tools/differential_fuzz.py 3
#
# The reference Makefile builds in-tree; its sources are copied to the
# build dir first (the reference tree must not be written to).
set -e
REF_SRC="${1:-/root/reference}"
BUILD_DIR="${2:-/tmp/refbuild}"

if [ -x "$BUILD_DIR/chromap" ]; then
    echo "reference binary already built: $BUILD_DIR/chromap"
    exit 0
fi

mkdir -p "$BUILD_DIR"
cp -r "$REF_SRC/src" "$REF_SRC/Makefile" "$BUILD_DIR/"
make -C "$BUILD_DIR" -j"$(nproc)"
"$BUILD_DIR/chromap" -h >/dev/null 2>&1 || true
echo "built: $BUILD_DIR/chromap"
