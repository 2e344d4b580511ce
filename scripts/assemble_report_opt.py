"""Assemble the full 44-row reference-format benchmark artifact.

The reference's ``make run`` emits one CSV with 4 decoders x 11 SNRs on
optimalH (main.cpp:42-92, reports/report_opt.csv). Our rows come from two
validate sweeps (BP + QP-ADMM at 10k trials; ALP + AGC-ALP at
suggested_trials budgets — AGC-ALP at 10k x 11 would be ~4h at the IPM
backend's FER-parity throughput). Concatenates them in the reference's
method order into reports/report_tpu_opt.csv.

Run: python scripts/assemble_report_opt.py
"""
import csv

SOURCES = ["reports/report_tpu_opt_bp_admm.csv",
           "reports/report_tpu_optimalH_alp_agc.csv"]
ORDER = ["BP", "QP-ADMM", "ALP", "AGC-ALP"]
OUT = "reports/report_tpu_opt.csv"

rows = []
header = None
for src in SOURCES:
    with open(src) as f:
        r = csv.reader(f)
        header = next(r)
        rows.extend(list(r))

rows.sort(key=lambda r: (ORDER.index(r[0]), float(r[1])))
assert len(rows) == 44, f"expected 44 rows, got {len(rows)}"
with open(OUT, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(header)
    w.writerows(rows)
print(f"wrote {OUT}: {len(rows)} rows")
