"""Parity table from an extended benchmark report vs the reference goldens.

Reads an *extended* report CSV produced by ``apps.benchmark``
(``--extended-report``; has a ``Trials`` column, so per-row n comes from the
artifact itself rather than being re-derived — see ADVICE round 3), computes
two-proportion z-scores against the transcribed reference curves
(``harness/reference_data.py``), and writes a markdown table + JSON.

Run: python scripts/parity_from_report.py reports/report_tpu_opt_run_ext.csv \
        optimalH reports/parity_optimalH_run.md
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_tpu.harness.reference_data import Z_BOUND, ref_fer, z_score


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "reports/report_tpu_opt_run_ext.csv"
    matrix = sys.argv[2] if len(sys.argv) > 2 else "optimalH"
    out_md = sys.argv[3] if len(sys.argv) > 3 else \
        f"reports/parity_{matrix}_run.md"

    rows = []
    with open(path) as f:
        for rec in csv.DictReader(f):
            method = rec["Method"]
            snr = float(rec["SNR"])
            fer = float(rec["FER"])
            n = int(rec["Trials"])
            p_ref = ref_fer(matrix, method, snr)
            z = z_score(fer, n, p_ref)
            verdict = ("PASS" if abs(z) < Z_BOUND
                       else ("better" if z < 0 else "FAIL"))
            rows.append(dict(method=method, snr=snr, fer=fer, ref=p_ref,
                             n=n, z=z, verdict=verdict))

    with open(out_md, "w") as f:
        f.write(f"## Parity table — {matrix} "
                f"(from {os.path.basename(path)}, one-command sweep)\n\n")
        f.write("| Method | SNR | ours | reference | n | z | verdict |\n")
        f.write("|---|---:|---:|---:|---:|---:|---|\n")
        for r in rows:
            f.write(f"| {r['method']} | {r['snr']:+.1f} | {r['fer']:.4f} | "
                    f"{r['ref']:.4f} | {r['n']} | {r['z']:+.2f} | "
                    f"{r['verdict']} |\n")
    with open(out_md.replace(".md", ".json"), "w") as f:
        json.dump(rows, f, indent=1)
    n_fail = sum(r["verdict"] == "FAIL" for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r["method"], []).append(r["verdict"])
    print(f"{len(rows)} rows, {n_fail} FAIL -> {out_md}")
    for m, vs in per.items():
        print(f"  {m}: {vs.count('PASS')} PASS, {vs.count('better')} better,"
              f" {vs.count('FAIL')} FAIL / {len(vs)}")


if __name__ == "__main__":
    main()
