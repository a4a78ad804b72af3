#!/usr/bin/env bash
# Nadir example (mirror of the reference example/nadir/run.sh).
# Usage: ./run.sh [CHECKMODE]
set -euo pipefail
cd "$(dirname "$0")"
J="python3 -m jurassic_tpu.cli"
export PYTHONPATH="${PYTHONPATH:-}:$(cd ../.. && pwd)"
CHECK=${1:-0}

# Create atmospheric data file...
$J.climatology nadir.ctl atm.tab

# Create observation geometry...
$J.nadir nadir.ctl obs.tab T1 10

rm -f rad.tab
# Call forward model...
$J.formod nadir.ctl obs.tab atm.tab rad.tab CHECKMODE "$CHECK"

if [ "$CHECK" = 0 ] && command -v gnuplot > /dev/null; then
gnuplot <<EOF
set term png enh truecolor font "Helvetica,28" size 1600,1200 crop lw 2
set out "plot.png"
set xla "latitude [deg]"
set yla "brightness temperature [K]"
plot "rad.org" u 10:11 w lp pt 1 t "ref (667.8 cm^{-1})", \
     "rad.tab" u 10:11 w lp pt 2 t "test (667.8 cm^{-1})"
EOF
fi

if [ "$CHECK" = 0 ]; then
    echo -e "\nCheck for differences..."
    diff -sq rad.tab rad.org || true
fi
