#!/bin/bash
# Round-3 TPU work queue (run when the tunnel recovers).
# 1. IPM timing breakdown; 2. warm-start speed check;
# 3. 10k-trial optimalH ALP+AGC parity sweep (the round's gate artifact).
cd /root/repo
set -x
timeout 900 python prof_ipm.py 64 2>&1 | grep -v WARNING
timeout 900 python prof_agc_fer.py -2.0 200 ipm_warm=0 2>&1 | grep -v WARNING | tail -1
timeout 900 python prof_agc_fer.py -2.0 200 ipm_warm=1 2>&1 | grep -v WARNING | tail -1
timeout 43000 python -m ldpc_tpu.apps.validate --matrix optimalH \
    --decoders alp,agc-alp --min-trials 10000 \
    --table-out reports/parity_optimalH_alp_agc.md \
    --json-out reports/parity_optimalH_alp_agc.json \
    --report reports/report_tpu_optimalH_alp_agc.csv
