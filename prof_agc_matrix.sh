#!/bin/bash
# AGC-ALP remedy matrix #2: cut-search-point fidelity knobs.
SNR=${1:--2.0}
TRIALS=${2:-1000}
cd /root/repo
for cfg in \
    "polish_tol=0.05" \
    "polish_tol=0.15" \
    "perturb=3e-3" \
    "perturb=1e-2" \
    "snap_tol=0.01" \
    "polish_tol=0.05 perturb=3e-3" \
    "polish_tol=0.1 snap_tol=0.01" \
    ; do
  echo "=== cfg: [$cfg] ==="
  timeout 1200 python prof_agc_fer.py $SNR $TRIALS $cfg 2>&1 | grep -v WARNING | tail -2
done
