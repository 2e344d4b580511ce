#!/usr/bin/env bash
# Block-length scaling artifact (SURVEY.md §5 scaling axis): run BP,
# QP-ADMM and ALP on the 520x640 rate-0.1875 H02 code
# (/root/reference/data/H02.txt, unused by the reference's own benchmarks)
# with the SAME derived constants — no per-code retuning — and record
# FER + throughput per SNR into reports/report_tpu_H02.csv.
# There is no reference golden for H02; the artifact demonstrates that the
# derived capacities/tier ladders and kernels hold at n=640 on the chip.
# Usage: scripts/run_h02_bench.sh   (single TPU process)
set -uo pipefail
cd "$(dirname "$0")/.."

python -m ldpc_tpu.apps.benchmark \
    --matrix data/H02.txt --decoders bp qp-admm \
    --snrs=-4.0 -3.0 -2.0 -1.0 0.0 \
    --trials 10000 --batch-size 0 \
    --report reports/report_tpu_H02.csv \
    --extended-report reports/report_tpu_H02_ext.csv \
    --resume true

python -m ldpc_tpu.apps.benchmark \
    --matrix data/H02.txt --decoders alp \
    --snrs=-4.0 -3.0 -2.0 -1.0 0.0 \
    --trials 2000 --batch-size 0 \
    --report reports/report_tpu_H02.csv \
    --extended-report reports/report_tpu_H02_ext.csv \
    --resume true
echo "[h02] done $(date)"
