"""Channel model unit tests against closed forms (utils/channel.h)."""
import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.channel.awgn import (bpsk, gen_random_codewords, llr,
                                   llr_variance, transmit)
from ldpc_tpu.codes.gf2 import gf2_nullspace, is_codeword


def test_llr_variance_closed_form():
    # sigma^2 = 10^(-snr/10)/2 (channel.h:12)
    for snr in (-5.0, -3.0, 0.0, 2.5):
        assert np.isclose(float(llr_variance(snr)), 10 ** (-snr / 10) / 2)


def test_llr_scaling():
    y = jnp.array([0.3, -1.2])
    snr = -3.0
    var = 10 ** (0.3) / 2
    np.testing.assert_allclose(np.asarray(llr(y, snr)),
                               2 * np.asarray(y) / var, rtol=1e-6)


def test_bpsk_mapping():
    # bit 0 -> +1, bit 1 -> -1 (channel.h:24)
    out = np.asarray(bpsk(jnp.array([0, 1, 0, 1])))
    np.testing.assert_array_equal(out, [1.0, -1.0, 1.0, -1.0])


def test_transmit_statistics():
    key = jax.random.PRNGKey(0)
    bits = jnp.zeros((2000, 8), jnp.uint8)
    snr = -3.0
    y = np.asarray(transmit(key, bits, snr))
    sigma = np.sqrt(10 ** 0.3 / 2)
    assert abs(y.mean() - 1.0) < 0.05
    assert abs(y.std() - sigma) < 0.05


def test_gen_random_codewords_are_codewords(tiny_h):
    g, _ = gf2_nullspace(tiny_h)
    cw = gen_random_codewords(jax.random.PRNGKey(3), g, 64)
    assert cw.shape == (64, tiny_h.shape[1])
    assert bool(is_codeword(jnp.asarray(tiny_h), cw).all())
    # nondegenerate: not all identical
    assert len(np.unique(np.asarray(cw), axis=0)) > 1
