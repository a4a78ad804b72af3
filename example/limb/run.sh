#!/usr/bin/env bash
# Limb example (mirror of the reference example/limb/run.sh).
# Usage: ./run.sh [CHECKMODE]   -- ./run.sh 1 is a dry-run smoke test.
set -euo pipefail
cd "$(dirname "$0")"
J="python3 -m jurassic_tpu.cli"
export PYTHONPATH="${PYTHONPATH:-}:$(cd ../.. && pwd)"
CHECK=${1:-0}

# Create atmospheric data file...
$J.climatology limb.ctl atm.tab

# Create observation geometry...
$J.limb limb.ctl obs.tab Z0 3 Z1 68 DZ 1.0

rm -f rad.tab
# Call forward model...
$J.formod limb.ctl obs.tab atm.tab rad.tab CHECKMODE "$CHECK"

# Plot results (tangent height vs radiance) when gnuplot is available...
if [ "$CHECK" = 0 ] && command -v gnuplot > /dev/null; then
gnuplot <<EOF
set term png enh truecolor font "Helvetica,28" size 1600,1200 crop lw 2
set out "plot.png"
set xla "radiance [nW/(cm^2 sr cm^{-1})]"
set yla "tangent height [km]"
set log x
plot "rad.org" u (\$11*1e5):8 w lp pt 1 t "ref (792 cm^{-1})", \
     "rad.org" u (\$12*1e5):8 w lp pt 1 t "ref (832 cm^{-1})", \
     "rad.tab" u (\$11*1e5):8 w lp pt 2 t "test (792 cm^{-1})", \
     "rad.tab" u (\$12*1e5):8 w lp pt 2 t "test (832 cm^{-1})"
EOF
fi

# Get differences...  (rad.org was produced with the full LUT set,
# which the public mount strips, so expect differences in the radiance
# columns; tangent-point columns 8-10 must match)
if [ "$CHECK" = 0 ]; then
    echo -e "\nCheck for differences..."
    diff -sq rad.tab rad.org || true
fi
