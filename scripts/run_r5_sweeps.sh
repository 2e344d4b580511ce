#!/usr/bin/env bash
# Round-5 flat-10k sweep queue (single TPU process; row-granular resume).
#  1. H05: ALP + AGC-ALP, 11 SNRs x 10,000 trials (completes the H05 table
#     to full statistical power — BP/QP-ADMM H05 are already 22/22 @ 10k).
#  2. optimalH: AGC-ALP regenerated at 10k under the round-5 fast config
#     (blocked Cholesky + plateau-adaptive IPM budget).
# Usage: setsid nohup scripts/run_r5_sweeps.sh > logs/r5_sweeps.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo "[sweep] start $(date)"

python -m ldpc_tpu.apps.benchmark \
    --matrix data/H05.txt --decoders alp agc-alp \
    --trials 10000 --batch-size 0 \
    --admm-alpha 1.95 --admm-mu 0.5 \
    --report reports/report_tpu_H05_run.csv \
    --extended-report reports/report_tpu_H05_run_ext.csv \
    --resume true
rc=$?
echo "[sweep] H05 alp+agc done $(date) rc=$rc"

python -m ldpc_tpu.apps.benchmark \
    --matrix data/optimalH.txt --decoders agc-alp \
    --trials 10000 --batch-size 0 \
    --report reports/report_tpu_opt_agc_r5.csv \
    --extended-report reports/report_tpu_opt_agc_r5_ext.csv \
    --resume true
rc=$?
echo "[sweep] optimalH agc done $(date) rc=$rc"
echo "[sweep] all done $(date)"
