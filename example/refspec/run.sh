#!/usr/bin/env bash
# Reference-spectra batch driver (mirror of the reference
# example/refspec/run.sh:7-29): steps 100-channel windows across
# 650-2350 cm^-1, runs climatology -> limb -> formod -> obs2spec per
# window.  Emissivity tables for each window must be present as
# <TBLBASE>_<nu>.tab_<gas> next to template.ctl (the public reference
# mount strips the real LUT blobs; tools/make_synthetic_tables.py can
# generate synthetic ones).
#
# Usage: ./run.sh [NU0 NU1 STEP]   (defaults 650 2350 100)
set -euo pipefail
cd "$(dirname "$0")"
J="python3 -m jurassic_tpu.cli"
export PYTHONPATH="${PYTHONPATH:-}:$(cd ../.. && pwd)"
NU0=${1:-650}
NU1=${2:-2350}
STEP=${3:-100}

for nu in $(seq "$NU0" "$STEP" "$NU1"); do
    # Modify control file...
    cp template.ctl limb_$nu.ctl
    echo $nu | awk '{
      for(i=0; i<100; i++)
        print "NU["i"] = "$1+i
    }' >> limb_$nu.ctl

    # Create atmospheric data file...
    $J.climatology limb_$nu.ctl atm.tab

    # Create observation geometry...
    $J.limb limb_$nu.ctl obs.tab Z0 3 Z1 68 DZ 1.0

    # Call forward model...
    $J.formod limb_$nu.ctl obs.tab atm.tab rad_$nu.tab

    # Convert spectra...
    for f in rad_$nu*; do
        $J.obs2spec limb_$nu.ctl "$f" "spec.$f"
        rm "$f"
    done
done
