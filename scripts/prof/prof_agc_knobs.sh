#!/bin/bash
# AGC-ALP remedy matrix #4: PDLP primal weight (lp_omega) x averaging.
SNR=${1:--2.0}
TRIALS=${2:-1000}
cd /root/repo
for cfg in \
    "lp_omega=0.25" \
    "lp_omega=4.0" \
    "lp_average=1 snap_tol=0.005" \
    "lp_omega=0.25 lp_average=1 snap_tol=0.005" \
    ; do
  echo "=== cfg: [$cfg] ==="
  timeout 2400 python prof_agc_fer.py $SNR $TRIALS $cfg 2>&1 | grep -v WARNING | tail -2
done
