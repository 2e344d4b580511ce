"""Assemble the full 22-row optimalH ALP+AGC-ALP parity artifact.

The optimalH LP-family sweep was produced in two validate runs (a full-grid
run interrupted mid-AGC by a tunnel drop, then an ``--snrs`` fill-in of the
remaining AGC points). This merges `reports/report_tpu_optimalH_alp_agc.csv`
with the fill-in's per-point trial counts into one parity table + JSON:
`reports/parity_optimalH_alp_agc.md` / `.json`.

Trial counts: rows covered by the fill-in JSON use its recorded n; earlier
rows used `suggested_trials(p_ref)` with no floor (the driver logs in
`logs/val_opt_alp_agc.log` confirm n per point).

Run: python scripts/merge_parity_optimalH.py
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_tpu.harness.reference_data import (Z_BOUND, ref_fer,
                                             suggested_trials, z_score)

REPORT = "reports/report_tpu_optimalH_alp_agc.csv"
FILL = "reports/parity_optimalH_agc_fill.json"
OUT_MD = "reports/parity_optimalH_alp_agc.md"
OUT_JSON = "reports/parity_optimalH_alp_agc.json"

fill_n = {}
if os.path.exists(FILL):
    with open(FILL) as f:
        for r in json.load(f):
            fill_n[(r["method"], round(r["snr"], 1))] = r["n"]

rows = []
with open(REPORT) as f:
    for r in csv.DictReader(f):
        method, snr, fer = r["Method"], float(r["SNR"]), float(r["FER"])
        p_ref = ref_fer("optimalH", method, snr)
        n = fill_n.get((method, round(snr, 1)), suggested_trials(p_ref))
        z = z_score(fer, n, p_ref)
        verdict = ("PASS" if abs(z) < Z_BOUND
                   else ("better" if z < 0 else "FAIL"))
        rows.append(dict(method=method, snr=snr, fer=fer, ref=p_ref,
                         z=z, n=n, verdict=verdict,
                         throughput=1.0 / float(r["Time"])))

rows.sort(key=lambda r: (r["method"] != "ALP", r["snr"]))
with open(OUT_MD, "w") as f:
    f.write("## Parity table — optimalH, ALP + AGC-ALP "
            "(merged full-grid + --snrs fill-in runs)\n\n")
    f.write("| Method | SNR | ours | reference | n | z | verdict |\n")
    f.write("|---|---:|---:|---:|---:|---:|---|\n")
    for r in rows:
        f.write(f"| {r['method']} | {r['snr']:+.1f} | {r['fer']:.4f} | "
                f"{r['ref']:.4f} | {r['n']} | {r['z']:+.2f} | "
                f"{r['verdict']} |\n")
with open(OUT_JSON, "w") as f:
    json.dump(rows, f, indent=1)

n_fail = sum(r["verdict"] == "FAIL" for r in rows)
print(f"{len(rows)} rows, {n_fail} FAIL, "
      f"max |z| = {max(abs(r['z']) for r in rows):.2f}")
