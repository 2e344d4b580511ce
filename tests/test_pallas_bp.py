"""Pallas BP kernel: interpret-mode equivalence vs the XLA mxu layout.

On CPU the kernel runs through the Pallas interpreter (exact semantics, no
Mosaic); the TPU-compiled path is exercised by bench.py and the validation
sweeps.
"""
import numpy as np
import pytest


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_kernel_matches_mxu_layout(small_h, interpreted_pallas):
    import jax
    import jax.numpy as jnp
    from ldpc_tpu.channel.awgn import channel_llr, gen_random_codewords
    from ldpc_tpu.codes.gf2 import gf2_nullspace
    from ldpc_tpu.decoders.bp import BPDecoder
    from ldpc_tpu.ops.pallas.bp_kernel import make_bp_pallas_decoder

    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(0)
    cw = gen_random_codewords(key, g, 128)
    _, llrs = channel_llr(jax.random.fold_in(key, 1), cw, 0.0)

    ref = BPDecoder(small_h, max_iter=15, layout="mxu").decode_batch(llrs)
    dec = make_bp_pallas_decoder(small_h, max_iter=15, tile_b=64)
    bits, done, iters = dec(llrs)
    done = np.asarray(done)[:, 0] > 0
    refs = np.asarray(ref.success)
    np.testing.assert_array_equal(done, refs)
    ok = done
    np.testing.assert_array_equal(np.asarray(bits)[ok],
                                  np.asarray(ref.bits)[ok])
    np.testing.assert_array_equal(np.asarray(iters)[ok, 0],
                                  np.asarray(ref.iterations)[ok])
