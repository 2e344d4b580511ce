"""Benchmark sweep app — the ``make run`` equivalent (``main.cpp:42-92``).

Sweeps the configured decoders over the SNR grid, streaming rows into a
reference-format ``report.csv`` and an extended report (pseudo rate,
throughput). Decoder name strings in the CSV match the reference
(``BP``, ``QP-ADMM``, ``ALP``, ``AGC-ALP``) so the analysis notebook's
plots work unchanged.

Run:  python -m ldpc_tpu.apps.benchmark --trials 10000 --matrix data/optimalH.txt
"""
from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from ..channel.awgn import gen_random_codewords
from ..codes.gf2 import gf2_nullspace
from ..codes.io import read_pcm
from ..config import SweepConfig, add_dataclass_args, apply_args
from ..decoders import default_batch, make_decoder
from ..harness.experiment import run_experiment
from ..harness.report import ReportWriter
from ..parallel.mesh import make_trial_mesh

CSV_NAMES = {"bp": "BP", "qp-admm": "QP-ADMM", "full-lp": "FullLP",
             "alp": "ALP", "agc-alp": "AGC-ALP"}


def run_sweep(cfg: SweepConfig, log=print) -> list[tuple[str, float, object]]:
    h = read_pcm(cfg.matrix)
    if cfg.generator:
        g = read_pcm(cfg.generator)
    else:
        g, ok = gf2_nullspace(h)
        if not ok:
            raise ValueError(f"{cfg.matrix} is singular; cannot derive G")
    log(f"n={h.shape[1]} k={h.shape[0]}", file=sys.stderr)

    key = jax.random.PRNGKey(cfg.seed)
    cw_key, noise_key = jax.random.split(key)
    codewords = np.asarray(gen_random_codewords(cw_key, g, cfg.trials))

    sharding = None
    if cfg.shard and len(jax.devices()) > 1:
        sharding = make_trial_mesh()

    done: set[tuple[str, float]] = set()
    if cfg.resume:
        import csv
        import os
        if os.path.exists(cfg.report):
            with open(cfg.report) as f:
                for rec in csv.DictReader(f):
                    done.add((rec["Method"], round(float(rec["SNR"]), 6)))
        log(f"resume: {len(done)} rows already present", file=sys.stderr)

    rows = []
    with ReportWriter(cfg.report, resume=cfg.resume) as rep:
        ext = (ReportWriter(cfg.extended_report, extended=True,
                            resume=cfg.resume)
               if cfg.extended_report else None)
        try:
            for kind in cfg.decoders:
                name = CSV_NAMES.get(kind, kind)
                todo = [s for s in cfg.snrs
                        if (name, round(float(s), 6)) not in done]
                if not todo:
                    continue
                dec = make_decoder(kind, h, cfg.decoder_cfg)
                bs = cfg.batch_size or default_batch(kind)
                log(f"Algo: {name}")
                for snr in todo:
                    res = run_experiment(dec, h, codewords, float(snr),
                                         noise_key, bs,
                                         sharding=sharding)
                    log(f"\tSNR: {snr}, FER: {res.fer:.5f}, "
                        f"(time={res.avg_time:.6f}s, "
                        f"{res.throughput:.0f} cw/s, pseudo={res.pseudo})")
                    rep.write_row(name, float(snr), res)
                    if ext:
                        ext.write_row(name, float(snr), res)
                    rows.append((name, float(snr), res))
        finally:
            if ext:
                ext.close()
    return rows


def main(argv=None):
    cfg = SweepConfig()
    p = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(p, cfg)
    apply_args(cfg, p.parse_args(argv))
    run_sweep(cfg)


if __name__ == "__main__":
    main()
