"""Analysis plots — the ``notebooks/plots.ipynb`` equivalent.

Produces the reference notebook's artifacts from ``report.csv`` files
(cells 1-9): per-matrix FER-vs-SNR semilog curves, before/after-optimization
comparison, decode-time curves, and channel-Hamming-distance curves; saves
``.eps``/``.png`` figures.

Run:  python -m ldpc_tpu.apps.plots report.csv --out plots/
      python -m ldpc_tpu.apps.plots report_opt.csv --compare report_H05.csv
"""
from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def read_report(path: str) -> dict[str, list[dict]]:
    """Rows grouped by Method, each row with float fields."""
    per_method: dict[str, list[dict]] = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            per_method[row["Method"]].append(
                {k: (v if k == "Method" else float(v))
                 for k, v in row.items()})
    for rows in per_method.values():
        rows.sort(key=lambda r: r["SNR"])
    return dict(per_method)


def plot_column(data, column: str, ylabel: str, title: str, out_path: str,
                logy: bool = True) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for method, rows in data.items():
        xs = [r["SNR"] for r in rows]
        ys = [r[column] for r in rows]
        ax.plot(xs, ys, marker="o", label=method)
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def plot_compare(data_a, data_b, label_a: str, label_b: str, column: str,
                 out_path: str) -> None:
    """Before/after comparison per method (notebook cells 5-7)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for method in sorted(set(data_a) | set(data_b)):
        for data, lbl, ls in ((data_a, label_a, "-"), (data_b, label_b, "--")):
            if method not in data:
                continue
            rows = data[method]
            ax.plot([r["SNR"] for r in rows], [r[column] for r in rows],
                    ls, marker="o", label=f"{method} ({lbl})")
    ax.set_yscale("log")
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel(column)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("report")
    p.add_argument("--compare", default=None,
                   help="second report for before/after plots")
    p.add_argument("--out", default="plots")
    p.add_argument("--fmt", default="png", choices=("png", "eps"))
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    data = read_report(args.report)
    f = args.fmt
    plot_column(data, "FER", "FER", "Frame error rate",
                os.path.join(args.out, f"fer.{f}"))
    plot_column(data, "Time", "seconds / codeword", "Decode time",
                os.path.join(args.out, f"time.{f}"))
    plot_column(data, "AvgHamming", "mean channel Hamming distance",
                "Channel errors", os.path.join(args.out, f"hamming.{f}"),
                logy=False)
    if args.compare:
        data_b = read_report(args.compare)
        plot_compare(data, data_b,
                     os.path.splitext(os.path.basename(args.report))[0],
                     os.path.splitext(os.path.basename(args.compare))[0],
                     "FER", os.path.join(args.out, f"fer_compare.{f}"))
    print(f"plots written to {args.out}/")


if __name__ == "__main__":
    main()
