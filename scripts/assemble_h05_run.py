"""Assemble the flat-10k H05 artifacts: 44-row reference-format CSV +
parity table.

Sources:
  * BP + QP-ADMM rows: the round-4 flat-10k run
    (``reports/report_tpu_H05_bp_admm.csv``; per-row n from
    ``reports/parity_H05_bp_admm.json`` — all 22 rows at n=10,000).
  * ALP rows: the round-5 one-command sweep
    (``reports/report_tpu_H05_run_ext.csv`` via ``apps.benchmark``,
    11 SNRs x 10,000 trials each).
  * AGC-ALP rows: regenerated under the FINAL round-5 config (per-lane
    latched IPM stall rule, ``reports/report_tpu_H05_agc_r5b{,_ext}.csv``)
    when that file exists; otherwise the one-command sweep's rows.

Outputs ``reports/report_tpu_H05.csv`` (44 rows, reference format) and
``reports/parity_H05_run.md`` + ``.json`` (verdicts vs
``reports/report_H05.csv`` transcribed in ``harness/reference_data.py``).

Run: python scripts/assemble_h05_run.py
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_tpu.harness.reference_data import Z_BOUND, ref_fer, z_score

ORDER = ["BP", "QP-ADMM", "ALP", "AGC-ALP"]


def main():
    # 1. reference-format 44-row CSV
    agc_r5b = False
    if os.path.exists("reports/report_tpu_H05_agc_r5b.csv"):
        with open("reports/report_tpu_H05_agc_r5b.csv") as f:
            # prefer the rerun only when COMPLETE (11 rows) — a partial
            # file (crash/round-end mid-sweep) falls back wholesale
            agc_r5b = sum(1 for ln in f if ln.strip()) >= 12
    rows = []
    header = None
    with open("reports/report_tpu_H05_bp_admm.csv") as f:
        r = csv.reader(f)
        header = next(r)
        rows.extend([x for x in r if x])
    with open("reports/report_tpu_H05_run.csv") as f:
        r = csv.reader(f)
        next(r)
        rows.extend([x for x in r
                     if x and not (agc_r5b and x[0] == "AGC-ALP")])
    if agc_r5b:
        with open("reports/report_tpu_H05_agc_r5b.csv") as f:
            r = csv.reader(f)
            next(r)
            rows.extend([x for x in r if x])
    rows.sort(key=lambda x: (ORDER.index(x[0]), float(x[1])))
    assert len(rows) == 44, f"expected 44 rows, got {len(rows)}"
    with open("reports/report_tpu_H05.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)

    # 2. parity rows: trials from the extended CSV (ALP/AGC) and the
    # round-4 parity json (BP/ADMM, all n=10,000)
    n_by = {}
    with open("reports/parity_H05_bp_admm.json") as f:
        for r in json.load(f):
            n_by[(r["method"], round(float(r["snr"]), 1))] = int(r["n"])
    ext_srcs = ["reports/report_tpu_H05_run_ext.csv"]
    if agc_r5b:
        ext_srcs.append("reports/report_tpu_H05_agc_r5b_ext.csv")
    for src in ext_srcs:
        with open(src) as f:
            for r in csv.DictReader(f):
                n_by[(r["Method"], round(float(r["SNR"]), 1))] = \
                    int(float(r["Trials"]))

    out = []
    for x in rows:
        method, snr, fer = x[0], round(float(x[1]), 1), float(x[3])
        n = n_by[(method, snr)]
        p_ref = ref_fer("H05", method, snr)
        z = z_score(fer, n, p_ref)
        verdict = ("PASS" if abs(z) < Z_BOUND
                   else ("better" if z < 0 else "FAIL"))
        out.append(dict(method=method, snr=snr, fer=fer, ref=p_ref, n=n,
                        z=z, verdict=verdict))

    with open("reports/parity_H05_run.md", "w") as f:
        f.write("## Parity table — H05 (flat 10,000 trials/point; "
                "BP+QP-ADMM from the round-4 10k run, ALP+AGC-ALP from "
                "the round-5 one-command sweep)\n\n")
        f.write("| Method | SNR | ours | reference | n | z | verdict |\n")
        f.write("|---|---:|---:|---:|---:|---:|---|\n")
        for r in out:
            f.write(f"| {r['method']} | {r['snr']:+.1f} | {r['fer']:.4f} "
                    f"| {r['ref']:.4f} | {r['n']} | {r['z']:+.2f} | "
                    f"{r['verdict']} |\n")
    with open("reports/parity_H05_run.json", "w") as f:
        json.dump(out, f, indent=1)
    n_fail = sum(r["verdict"] == "FAIL" for r in out)
    n_10k = sum(r["n"] >= 10000 for r in out)
    print(f"parity_H05_run: {len(out)} rows, {n_10k} at n>=10k, "
          f"{n_fail} FAIL")


if __name__ == "__main__":
    main()
