"""Headline benchmark: decoded codewords/s/chip for BP (50 iterations,
sum-product) on data/optimalH.txt at SNR=-3 dB — the BASELINE.json metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the reference's committed report gives BP 13.08 ms/codeword at
SNR=-3 with 100-iteration early-exit decoding on a CPU thread
(reports/report_opt.csv:6) => 76.4 cw/s/thread, 611 cw/s for the 8-thread
harness (main.cpp:23). vs_baseline compares our one-chip throughput against
the full 8-thread reference aggregate — the honest machine-vs-machine ratio.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.channel.awgn import gen_random_codewords
    from ldpc_tpu.codes.gf2 import gf2_nullspace
    from ldpc_tpu.codes.io import read_pcm
    from ldpc_tpu.decoders.bp import BPDecoder
    from ldpc_tpu.harness.experiment import run_experiment

    h = read_pcm("data/optimalH.txt")
    g, _ = gf2_nullspace(h)
    key = jax.random.PRNGKey(239_239_239)
    cw_key, noise_key = jax.random.split(key)

    snr = -3.0
    trials = 65536
    batch = 8192
    codewords = np.asarray(gen_random_codewords(cw_key, g, trials))

    layout = "pallas" if jax.default_backend() == "tpu" else "mxu"
    dec = BPDecoder(h, max_iter=50, layout=layout)
    res = run_experiment(dec, h, codewords, snr, noise_key, batch_size=batch)

    throughput = res.throughput
    baseline_cws = 611.0  # 8-thread reference aggregate at SNR=-3 (see above)

    # FER fidelity vs the reference curve (100-iter config) is checked by the
    # validation sweep; report the 50-iter FER as an extra for context.
    out = {
        "metric": "BP-50it decoded codewords/s/chip (optimalH, SNR=-3dB)",
        "value": round(throughput, 1),
        "unit": "codewords/s/chip",
        "vs_baseline": round(throughput / baseline_cws, 2),
        "extra": {
            "fer_50it": round(res.fer, 4),
            "trials": trials,
            "avg_iterations": round(res.sum_iterations / res.total, 2),
            "device": str(jax.devices()[0]),
            "layout": layout,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
