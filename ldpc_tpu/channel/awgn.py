"""BPSK-AWGN channel model, batched and jittable.

Numeric conventions pinned to the reference (``utils/channel.h``):

* noise variance  sigma^2 = 10**(-snr/10) / 2        (``channel.h:12``)
* BPSK modulation bit 0 -> +1.0, bit 1 -> -1.0       (``channel.h:24``)
* LLR(y) = 2*y / sigma^2                             (``channel.h:14-16``)
* EPS = 1e-8                                         (``channel.h:10``)

Per-trial determinism: the reference seeds ``mt19937 rnd(trial_index + 1)``
(``experiment.h:97``); here each trial's noise key is
``jax.random.fold_in(base_key, trial_index)`` — deterministic and independent
of how trials are sharded across chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8

__all__ = ["EPS", "llr_variance", "llr", "bpsk", "transmit", "channel_llr",
           "gen_random_codewords"]


def llr_variance(snr):
    """Noise variance for the repo's SNR convention (``channel.h:12``)."""
    return jnp.power(10.0, -(snr / 10.0)) / 2.0


def llr(y, snr):
    """Channel LLR of received symbol(s) (``channel.h:14-16``)."""
    return 2.0 * y / llr_variance(snr)


def bpsk(bits):
    """Map bits {0,1} -> symbols {+1,-1} (``channel.h:24``)."""
    return 1.0 - 2.0 * jnp.asarray(bits, jnp.float32)


def transmit(key, bits, snr):
    """Transmit a batch of codewords over BPSK-AWGN.

    ``bits``: (..., n) {0,1}; returns received symbols (..., n) float32.
    """
    sigma = jnp.sqrt(llr_variance(snr)).astype(jnp.float32)
    noise = jax.random.normal(key, jnp.shape(bits), dtype=jnp.float32)
    return bpsk(bits) + sigma * noise


def channel_llr(key, bits, snr):
    """Transmit and convert to LLRs in one step; returns (y, llr)."""
    y = transmit(key, bits, snr)
    return y, llr(y, snr)


def gen_random_codewords(key, g, num: int):
    """Sample ``num`` random codewords as random GF(2) combinations of G's
    rows (semantics of ``gen_random_codeword``, ``channel.h:28-36``).

    ``g``: (k, n) generator matrix. Returns (num, n) uint8 on device.
    """
    g = jnp.asarray(g, jnp.uint8)
    k = g.shape[0]
    coeffs = jax.random.bernoulli(key, 0.5, (num, k)).astype(jnp.int32)
    return ((coeffs @ g.astype(jnp.int32)) % 2).astype(jnp.uint8)
