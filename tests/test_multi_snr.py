"""Fused multi-SNR harness must reproduce the per-SNR harness exactly."""
import jax
import numpy as np

from ldpc_tpu.channel.awgn import gen_random_codewords
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.decoders.bp import BPDecoder
from ldpc_tpu.harness.experiment import (run_experiment,
                                         run_multi_snr_experiment)


def test_fused_matches_per_snr(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(5)
    cw = np.asarray(gen_random_codewords(key, g, 48))
    dec = BPDecoder(small_h, max_iter=12)
    snrs = [0.0, 2.0, 4.0]
    fused = run_multi_snr_experiment(dec, small_h, cw, snrs, key,
                                     batch_size=36)
    for snr, fres in zip(snrs, fused):
        single = run_experiment(dec, small_h, cw, snr, key, batch_size=48)
        assert fres.total == single.total == 48
        assert (fres.correct, fres.pseudo, fres.sum_hamming,
                fres.sum_hamming_ok, fres.sum_hamming_wrong) == \
               (single.correct, single.pseudo, single.sum_hamming,
                single.sum_hamming_ok, single.sum_hamming_wrong), snr
