"""QP-ADMM streaming vs batched throughput probe at one SNR."""
import sys, time
import numpy as np
import jax

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords
from ldpc_tpu.decoders.admm import QPADMMDecoder
from ldpc_tpu.harness.experiment import run_experiment

SNR = float(sys.argv[1]) if len(sys.argv) > 1 else -3.0
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 256
MODE = sys.argv[4] if len(sys.argv) > 4 else "stream"

h = read_pcm("data/optimalH.txt")
g, ok = gf2_nullspace(h)
key = jax.random.PRNGKey(239_239_239)
cw_key, noise_key = jax.random.split(key)
cw = np.asarray(gen_random_codewords(cw_key, g, TRIALS))
dec = QPADMMDecoder(h)
res = run_experiment(dec, h, cw, SNR, noise_key, batch_size=BATCH,
                     streaming=(MODE == "stream"))
print(f"ADMM {MODE} B={BATCH} snr={SNR}: FER={res.fer:.4f} "
      f"{res.throughput:.0f} cw/s avg_it={res.sum_iterations/res.total:.0f} "
      f"pseudo={res.pseudo}")
