#!/bin/bash
# Build the reference JURASSIC-GPU CPU binaries as the verification oracle.
# Compiles /root/reference/src (read-only) out-of-tree into
# tools/ref_build/bin using the header-only GSL shim in tools/gsl_shim
# (the mount strips lib/gsl-2.5.tar.gz). CPU-only: no nvcc involved.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
SRC="$REF/src"
OUT="$HERE/ref_build"
BIN="$OUT/bin"
mkdir -p "$OUT" "$BIN"

CC=${CC:-gcc}
CFLAGS="-std=gnu99 -I $HERE/gsl_shim -DHAVE_INLINE -O3 -fopenmp \
 -fno-common -fshort-enums -fno-omit-frame-pointer -Wfatal-errors \
 -Wno-unknown-pragmas"

# jurassic.c #includes its .tbl data tables from the compile cwd
cd "$SRC"

$CC $CFLAGS -c jurassic.c -o "$OUT/jurassic.o"
$CC $CFLAGS -c CPUdrivers.c -o "$OUT/CPUdrivers.o"

for exc in formod obs2spec brightness climatology jsec2time limb nadir \
           planck time2jsec memoryinfo hash; do
  $CC $CFLAGS "$exc.c" "$OUT/jurassic.o" "$OUT/CPUdrivers.o" \
      -o "$BIN/$exc" -lm
done

echo "Built reference CPU binaries in $BIN"
