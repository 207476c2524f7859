#!/bin/sh
# VERDICT r4 task 4: SIC measured at the FULL north star (64 ch x SF7-12).
# Runs --mode north_star with and without --sic back to back on the TPU;
# the stderr split lines carry wall['sic'], packet counts, sic_windows.
set -x
timeout 2400 python bench.py --mode north_star 2>&1
echo "=== with SIC ==="
timeout 2400 python bench.py --mode north_star --sic 2>&1
