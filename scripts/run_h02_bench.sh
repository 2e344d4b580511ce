#!/usr/bin/env bash
# Block-length scaling artifact (SURVEY.md §5 scaling axis): run BP,
# QP-ADMM and ALP on the 520x640 rate-0.1875 H02 code
# (/root/reference/data/H02.txt, unused by the reference's own benchmarks)
# with the SAME derived constants — no per-code retuning — and record
# FER + throughput per SNR into reports/report_tpu_H02.csv.
# There is no reference golden for H02; the artifact demonstrates that the
# derived capacities/tier ladders and kernels hold at n=640 on the chip.
# SNR grid: the rate-0.1875 code's waterfall sits at -9..-5 dB under the
# reference's SNR convention (probe: BP FER 0.99/0.81/0.27 at -9/-8/-7).
# Usage: scripts/run_h02_bench.sh   (single TPU process)
set -uo pipefail
cd "$(dirname "$0")/.."

# QP-ADMM: H02 has degree-2 check rows -> e_min = 2.0, so the reference
# defaults (alpha=1.2, mu=0.55) FAIL the feasibility precondition
# min(e)*mu > alpha (algo/qp_admm.h:108-114) and the decoder bails to
# all-zero exactly as the reference would (measured: FER 1.0 across the
# grid). The artifact uses feasible (alpha=0.9, mu=0.5) instead.
python -m ldpc_tpu.apps.benchmark \
    --matrix data/H02.txt --decoders bp qp-admm \
    --admm-alpha 0.9 --admm-mu 0.5 \
    --snrs=-9.0,-8.0,-7.0,-6.0,-5.0 \
    --trials 10000 --batch-size 0 \
    --report reports/report_tpu_H02.csv \
    --extended-report reports/report_tpu_H02_ext.csv \
    --resume true

python -m ldpc_tpu.apps.benchmark \
    --matrix data/H02.txt --decoders alp \
    --snrs=-9.0,-8.0,-7.0,-6.0,-5.0 \
    --trials 2000 --batch-size 0 \
    --report reports/report_tpu_H02.csv \
    --extended-report reports/report_tpu_H02_ext.csv \
    --resume true
rc=$?
echo "[h02] done $(date) rc=$rc"
