#!/bin/bash
# Regenerate the golden test fixtures in tests/goldens/ from the locally
# built reference CPU binaries (see build_reference.sh).  Three cases:
#   limb  - reference example (stub tables: gases transparent; exercises
#           raytracing, continua, source function, limb geometry)
#   nadir - reference example (surface emission + brightness temperature)
#   ega   - synthetic analytic tables (exercises the EGA hot path)
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
REF=${REF:-/root/reference}
BIN="$HERE/ref_build/bin"
GOLD="$REPO/tests/goldens"

[ -x "$BIN/formod" ] || "$HERE/build_reference.sh"

run_ref() { OMP_NUM_THREADS=1 "$BIN/$@"; }

# --- limb ------------------------------------------------------------
mkdir -p "$GOLD/limb" && cd "$GOLD/limb"
cp "$REF"/example/limb/limb.ctl "$REF"/example/limb/*.filt \
   "$REF"/example/limb/*_F11.tab "$REF"/example/limb/*_CCl4.tab .
run_ref climatology limb.ctl atm.tab > /dev/null
run_ref limb limb.ctl obs.tab Z0 3 Z1 68 DZ 1.0 > /dev/null
run_ref formod limb.ctl obs.tab atm.tab rad.tab > /dev/null

# --- nadir -----------------------------------------------------------
mkdir -p "$GOLD/nadir" && cd "$GOLD/nadir"
cp "$REF"/example/nadir/nadir.ctl "$REF"/example/nadir/*.filt .
run_ref climatology nadir.ctl atm.tab > /dev/null
run_ref nadir nadir.ctl obs.tab T1 10 > /dev/null
run_ref formod nadir.ctl obs.tab atm.tab rad.tab > /dev/null

# --- ega (synthetic tables) -----------------------------------------
mkdir -p "$GOLD/ega" && cd "$GOLD/ega"
python3 "$HERE/make_synthetic_tables.py" . --tblbase synth \
    --gases CO2 H2O O3 --channels 792.0 832.0 > /dev/null
cat > ega.ctl <<'EOF'
# Synthetic-table EGA verification case
TBLBASE = ./synth
NG = 3
EMITTER[0] = CO2
EMITTER[1] = H2O
EMITTER[2] = O3
ND = 2
NU[0] = 792.0000
NU[1] = 832.0000
WRITE_BINARY = 0
READ_BINARY = 0
USEGPU = 0
EOF
run_ref climatology ega.ctl atm.tab > /dev/null
run_ref limb ega.ctl obs.tab Z0 6 Z1 66 DZ 6.0 > /dev/null
run_ref formod ega.ctl obs.tab atm.tab rad.tab > /dev/null

echo "goldens regenerated in $GOLD"
