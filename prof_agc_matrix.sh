#!/bin/bash
# AGC-ALP remedy matrix at one SNR point (default -2, the worst parity point).
# Each run is a fresh process (knobs are jit-baked constants).
SNR=${1:--2.0}
TRIALS=${2:-1000}
cd /root/repo
for cfg in \
    "" \
    "lp_tol=3e-5" \
    "gauss_margin=5e-4" \
    "gauss_margin=8e-4" \
    "lp_average=1" \
    "snap_tol=0.05" \
    "max_rounds=128" \
    ; do
  echo "=== cfg: [$cfg] ==="
  timeout 1200 python prof_agc_fer.py $SNR $TRIALS $cfg 2>&1 | grep -v WARNING | tail -2
done
