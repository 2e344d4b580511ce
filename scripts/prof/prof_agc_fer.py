"""AGC-ALP FER isolation experiments at one SNR."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder
from ldpc_tpu.harness.experiment import run_experiment

SNR = float(sys.argv[1]) if len(sys.argv) > 1 else -2.0
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
kw = {}
for a in sys.argv[3:]:
    k, v = a.split("=")
    try:
        kw[k] = float(v) if "." in v or "e" in v else int(v)
    except ValueError:
        kw[k] = v

h = read_pcm("data/optimalH.txt")
g, ok = gf2_nullspace(h)
key = jax.random.PRNGKey(239_239_239)
cw_key, noise_key = jax.random.split(key)
cw = np.asarray(gen_random_codewords(cw_key, g, TRIALS))

import inspect
sig = set(inspect.signature(AGCALPDecoder.__init__).parameters)
ctor = {k: v for k, v in kw.items() if k in sig}
dec = AGCALPDecoder(h, **ctor)
for k, v in kw.items():
    if k not in sig:
        assert hasattr(dec, k), k
        setattr(dec, k, v)
t0 = time.time()
res = run_experiment(dec, h, cw, SNR, noise_key, batch_size=64)
print(f"AGC {kw} snr={SNR}: FER={res.fer:.4f} "
      f"({res.throughput:.0f} cw/s, pseudo={res.pseudo}, "
      f"dropped={res.sum_dropped}, wall={time.time()-t0:.0f}s)")
