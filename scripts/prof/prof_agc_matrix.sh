#!/bin/bash
# AGC-ALP remedy matrix #3: break the PDHG plateau (averaging restarts).
SNR=${1:--2.0}
TRIALS=${2:-1000}
cd /root/repo
for cfg in \
    "lp_average=1 lp_backend=xla" \
    "lp_average=1 lp_backend=xla snap_tol=0.01" \
    "lp_average=1 lp_backend=xla lp_tol=3e-5 snap_tol=0.01" \
    "snap_tol=0.005" \
    "snap_tol=0.01 gauss_margin=5e-4" \
    ; do
  echo "=== cfg: [$cfg] ==="
  timeout 1800 python prof_agc_fer.py $SNR $TRIALS $cfg 2>&1 | grep -v WARNING | tail -2
done
