"""Assemble the round-5 optimalH 44-row artifact + parity table.

AGC-ALP rows are regenerated at flat 10k under the round-5 fast config
(blocked Cholesky + plateau-adaptive IPM budget,
``reports/report_tpu_opt_agc_r5_ext.csv``); BP/QP-ADMM/ALP rows come from
the round-4 EXECUTED one-command run (``reports/report_tpu_opt_run.csv``,
flat 10k) — those decoder configs are unchanged in round 5. Outputs
``reports/report_tpu_opt_run_r5.csv`` and regenerates
``reports/parity_optimalH_run.md`` + ``.json``.

Run: python scripts/assemble_opt_run_r5.py
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_tpu.harness.reference_data import Z_BOUND, ref_fer, z_score

ORDER = ["BP", "QP-ADMM", "ALP", "AGC-ALP"]


def main():
    rows, header = [], None
    with open("reports/report_tpu_opt_run.csv") as f:
        r = csv.reader(f)
        header = next(r)
        rows.extend([x for x in r if x and x[0] != "AGC-ALP"])
    with open("reports/report_tpu_opt_agc_r5.csv") as f:
        r = csv.reader(f)
        next(r)
        rows.extend([x for x in r if x])
    rows.sort(key=lambda x: (ORDER.index(x[0]), float(x[1])))
    assert len(rows) == 44, f"expected 44 rows, got {len(rows)}"
    with open("reports/report_tpu_opt_run_r5.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)

    n_by = {}
    for src in ("reports/report_tpu_opt_run_ext.csv",
                "reports/report_tpu_opt_agc_r5_ext.csv"):
        with open(src) as f:
            for r in csv.DictReader(f):
                n_by[(r["Method"], round(float(r["SNR"]), 1))] = \
                    int(float(r["Trials"]))

    out = []
    for x in rows:
        method, snr, fer = x[0], round(float(x[1]), 1), float(x[3])
        n = n_by[(method, snr)]
        p_ref = ref_fer("optimalH", method, snr)
        z = z_score(fer, n, p_ref)
        verdict = ("PASS" if abs(z) < Z_BOUND
                   else ("better" if z < 0 else "FAIL"))
        out.append(dict(method=method, snr=snr, fer=fer, ref=p_ref, n=n,
                        z=z, verdict=verdict))
    with open("reports/parity_optimalH_run.md", "w") as f:
        f.write("## Parity table — optimalH (flat 10,000 trials/point; "
                "AGC-ALP regenerated round 5 under the fast config, other "
                "decoders from the round-4 flat-10k run)\n\n")
        f.write("| Method | SNR | ours | reference | n | z | verdict |\n")
        f.write("|---|---:|---:|---:|---:|---:|---|\n")
        for r in out:
            f.write(f"| {r['method']} | {r['snr']:+.1f} | {r['fer']:.4f} "
                    f"| {r['ref']:.4f} | {r['n']} | {r['z']:+.2f} | "
                    f"{r['verdict']} |\n")
    with open("reports/parity_optimalH_run.json", "w") as f:
        json.dump(out, f, indent=1)
    n_fail = sum(r["verdict"] == "FAIL" for r in out)
    print(f"parity_optimalH_run: {len(out)} rows, {n_fail} FAIL, "
          f"{sum(r['n'] >= 10000 for r in out)} at n>=10k")


if __name__ == "__main__":
    main()
