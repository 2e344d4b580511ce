"""Driver for the long-double BP floor reproduction (bp_floor_native.cpp).

Generates channel draws at the requested SNR with the framework's channel
model, then runs the native flooding sum-product decoder twice — unclamped
phi (the reference's numerics, ``algo/bp.h:34``) and clamped phi (our
production policy) — on identical inputs, on the reference's own numeric
type (x87 long double). Measured at 0 dB / 100 iters / optimalH: NO floor
on x87 long double (FER 0.0000 both variants) — on x86 the phi-saturation
path alone does not fire at 0 dB. Re-run with --snr -1.0 after editing
bp_floor_native.cpp's `typedef long double ld` to `double` to see the
64-bit-long-double (ARM macOS) variant's small NaN floor (~0.15%). The
reference's published ~3.3% flat floor is a data race in its threaded
harness — see prof_bp_floor_race.sh and VALIDATION.md.

Usage: JAX_PLATFORMS=cpu python scripts/prof/prof_bp_floor_native.py
       [--snr 0.0] [--trials 10000] [--iters 100]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ldpc_tpu.channel.awgn import (bpsk, gen_random_codewords,  # noqa: E402
                                   llr_variance)
from ldpc_tpu.codes.gf2 import gf2_nullspace  # noqa: E402
from ldpc_tpu.codes.io import read_pcm  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--matrix", default="data/optimalH.txt")
    p.add_argument("--snr", type=float, default=0.0)
    p.add_argument("--trials", type=int, default=10000)
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "bp_floor_native.cpp")
    exe = os.path.join(tempfile.gettempdir(), "bp_floor_native")
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", exe, src], check=True)

    h = read_pcm(args.matrix)
    g, ok = gf2_nullspace(h)
    assert ok
    key = jax.random.PRNGKey(239)
    cw = np.asarray(gen_random_codewords(key, g, args.trials))
    sigma = float(np.sqrt(float(llr_variance(args.snr))))
    inv_var = 2.0 / float(llr_variance(args.snr))
    rng = np.random.default_rng(239)
    noise = rng.normal(size=cw.shape).astype(np.float64)
    llrs = inv_var * (np.asarray(bpsk(cw), np.float64) + sigma * noise)

    with tempfile.TemporaryDirectory() as td:
        lf = os.path.join(td, "llrs.txt")
        cf = os.path.join(td, "cw.txt")
        np.savetxt(lf, llrs, fmt="%.17g")
        with open(cf, "w") as f:
            for row in cw:
                f.write("".join(map(str, row)) + "\n")
        print(f"SNR={args.snr} dB, {args.trials} trials, {args.iters} "
              f"iters, matrix {args.matrix}, long double (x87)")
        out = {}
        for clamp in (0, 1):
            r = subprocess.run(
                [exe, args.matrix, lf, cf, str(args.iters), str(clamp)],
                capture_output=True, text=True, check=True)
            d = json.loads(r.stdout)
            out[clamp] = d
            name = "clamped" if clamp else "unclamped"
            frac = d["nan_fails"] / d["fails"] if d["fails"] else 0.0
            print(f"  {name:10s}: FER = {d['fer']:.4f}  ({d['fails']} "
                  f"failures, {d['nan_fails']} with NaN estimates = "
                  f"{100 * frac:.0f}%)")
        extra = out[0]["fails"] - out[1]["fails"]
        ref = 0.0337  # reports/report_opt.csv:12 (BP @ 0 dB, optimalH)
        print(f"\nUnclamped long-double floor: {out[0]['fer']:.4f} "
              f"(reference published 0 dB floor: {ref}); clamping removes "
              f"{extra} failures.")


if __name__ == "__main__":
    main()
