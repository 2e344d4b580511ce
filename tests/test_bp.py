"""BP decoder tests: differential oracle vs an independent scalar NumPy
implementation of the reference equations (algo/bp.h), layout equivalence,
and statistical sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.channel.awgn import channel_llr
from ldpc_tpu.codes.gf2 import gf2_nullspace, is_codeword
from ldpc_tpu.channel.awgn import gen_random_codewords
from ldpc_tpu.decoders.bp import BPDecoder


def scalar_bp_reference(h, llr_vec, max_iter):
    """Straightforward scalar sum-product in the phi domain, transcribing the
    math of algo/bp.h:34,49-57,77-90 (flooding schedule, estimate<=0 -> 1,
    syndrome early exit). Written independently of the batched decoder."""
    m, n = h.shape

    def phi(x):
        x = min(max(x, 1e-9), 31.0)
        return -np.log(np.tanh(x / 2))

    edges = [(i, j) for i in range(m) for j in range(n) if h[i, j]]
    c2v = {e: 0.0 for e in edges}
    for it in range(max_iter):
        # v -> c messages from current c2v
        v2c = {}
        for (i, j) in edges:
            s = llr_vec[j] + sum(c2v[(i2, j)] for (i2, j2) in edges
                                 if j2 == j and i2 != i)
            v2c[(i, j)] = s
        # c -> v
        for (i, j) in edges:
            mags = 0.0
            sgn = 1.0
            for (i2, j2) in edges:
                if i2 == i and j2 != j:
                    x = v2c[(i, j2)]
                    mags += phi(abs(x))
                    sgn *= -1.0 if x <= 0 else 1.0
            c2v[(i, j)] = sgn * phi(mags) if mags > 0 else sgn * phi(1e-9)
        est = np.array([llr_vec[j] + sum(c2v[(i, j)] for (i, j2) in edges
                                         if j2 == j) for j in range(n)])
        bits = (est <= 0).astype(np.uint8)
        if not ((h @ bits) % 2).any():
            return bits, True, it + 1
    return bits, False, max_iter


@pytest.mark.parametrize("layout", ["edge", "dense"])
def test_bp_matches_scalar_oracle(tiny_h, layout):
    h = tiny_h
    g, _ = gf2_nullspace(h)
    key = jax.random.PRNGKey(7)
    cw = gen_random_codewords(key, g, 32)
    _, llrs = channel_llr(jax.random.fold_in(key, 9), cw, 2.0)
    dec = BPDecoder(h, max_iter=20, layout=layout)
    res = dec.decode_batch(llrs)
    llrs_np = np.asarray(llrs)
    for t in range(32):
        bits, ok, iters = scalar_bp_reference(h, llrs_np[t], 20)
        assert bool(res.success[t]) == ok, f"trial {t}"
        if ok:
            np.testing.assert_array_equal(np.asarray(res.bits[t]), bits)
            assert int(res.iterations[t]) == iters


def test_all_layouts_equivalent(small_h):
    """Cross-check every BP layout pairing (edge / dense / mxu) on a real
    code — the default layout is 'mxu', so each must be named explicitly."""
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(0)
    cw = gen_random_codewords(key, g, 48)
    _, llrs = channel_llr(jax.random.fold_in(key, 1), cw, 0.0)
    results = {
        layout: BPDecoder(small_h, max_iter=30,
                          layout=layout).decode_batch(llrs)
        for layout in ("edge", "dense", "mxu")
    }
    base = results["edge"]
    ok = np.asarray(base.success)
    for layout in ("dense", "mxu"):
        r = results[layout]
        np.testing.assert_array_equal(ok, np.asarray(r.success),
                                      err_msg=f"edge vs {layout}")
        np.testing.assert_array_equal(np.asarray(base.bits)[ok],
                                      np.asarray(r.bits)[ok],
                                      err_msg=f"edge vs {layout}")


def test_bp_decodes_noiseless(small_h):
    g, _ = gf2_nullspace(small_h)
    cw = gen_random_codewords(jax.random.PRNGKey(2), g, 16)
    llrs = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 10.0  # clean channel
    res = BPDecoder(small_h, max_iter=5).decode_batch(jnp.asarray(llrs))
    assert bool(res.success.all())
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(cw))
    assert (np.asarray(res.iterations) == 1).all()


def test_bp_success_implies_codeword(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(11)
    cw = gen_random_codewords(key, g, 64)
    _, llrs = channel_llr(jax.random.fold_in(key, 5), cw, -2.0)
    res = BPDecoder(small_h, max_iter=15).decode_batch(llrs)
    ok = np.asarray(res.success)
    valid = np.asarray(is_codeword(jnp.asarray(small_h), res.bits))
    assert (valid[ok]).all()


def test_minsum_variant_runs(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(4)
    cw = gen_random_codewords(key, g, 32)
    _, llrs = channel_llr(jax.random.fold_in(key, 1), cw, 2.0)
    res = BPDecoder(small_h, max_iter=20, variant="minsum").decode_batch(llrs)
    ok = np.asarray(res.success)
    valid = np.asarray(is_codeword(jnp.asarray(small_h), res.bits))
    assert ok.mean() > 0.5  # minsum should still decode most at 2 dB
    assert valid[ok].all()
