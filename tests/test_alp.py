"""ALP / AGC-ALP / FullLP decoder tests.

Oracles: (1) scalar transcription of the AddRowsALP cut search
(algo/alp.h:21-97); (2) an exact scalar ALP using scipy's HiGHS simplex as
the GLPK stand-in, for end-to-end certificate/bit comparison."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from ldpc_tpu.channel.awgn import channel_llr, gen_random_codewords
from ldpc_tpu.codes.gf2 import gf2_nullspace, is_codeword
from ldpc_tpu.decoders.alp import ALPDecoder, alp_cut_candidates
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder
from ldpc_tpu.decoders.lp import FullLPDecoder


def scalar_cut_search(h, u, eps=1e-8):
    """Transcription of AddRowsALP's per-row cut computation."""
    cuts = []
    for i in range(h.shape[0]):
        sup = np.nonzero(h[i])[0]
        if len(sup) == 0:
            cuts.append(None)
            continue
        j_best, val_best = 0, 10.0
        v_size = 0
        for j in sup:
            cur = abs(u[j] - 0.5)
            if cur < val_best:
                j_best, val_best = j, cur
            if u[j] > 0.5:
                v_size += 1
        is_v = np.zeros(h.shape[1], bool)
        for j in sup:
            if j == j_best and v_size % 2 == 0:
                if u[j] <= 0.5:
                    is_v[j] = True
            else:
                if u[j] > 0.5:
                    is_v[j] = True
        assert is_v.sum() % 2 == 1
        s = sum((1 - u[j]) if is_v[j] else u[j] for j in sup)
        if s < 1.0 - eps:
            coef = np.zeros(h.shape[1], np.float32)
            coef[sup] = -1.0
            coef[is_v] = 1.0
            cuts.append((coef, float(is_v.sum() - 1)))
        else:
            cuts.append(None)
    return cuts


def scalar_alp(h, llr_vec, max_rounds=50, int_tol=1e-6):
    """Exact ALP with HiGHS as the LP solver (alp.h:103-135 semantics)."""
    n = h.shape[1]
    a_rows, rhs = [], []
    bounds = [(0, 1)] * n
    x = (np.asarray(llr_vec) < 0).astype(float)  # box LP optimum
    for _ in range(max_rounds):
        cuts = scalar_cut_search(h, x)
        new = [c for c in cuts if c is not None]
        if not new:
            break
        for coef, r in new:
            a_rows.append(coef)
            rhs.append(r)
        res = linprog(llr_vec, A_ub=np.array(a_rows), b_ub=np.array(rhs),
                      bounds=bounds, method="highs")
        assert res.status == 0
        x = res.x
    bits = (x > 0.5).astype(np.uint8)
    integral = bool(np.all((x < int_tol) | (x > 1 - int_tol)))
    ok = integral and not ((h @ bits) % 2).any()
    return bits, ok


def test_cut_candidates_match_scalar(small_h):
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 1, (3, small_h.shape[1])).astype(np.float32)
    u[1] = np.round(u[1])  # integral lane
    sup = jnp.asarray(small_h.astype(bool))
    rows, rhs, add = alp_cut_candidates(sup, jnp.asarray(u), cut_tol=1e-8)
    rows, rhs, add = map(np.asarray, (rows, rhs, add))
    for b in range(3):
        cuts = scalar_cut_search(small_h, u[b])
        for i, cut in enumerate(cuts):
            assert add[b, i] == (cut is not None), f"lane {b} row {i}"
            if cut is not None:
                np.testing.assert_array_equal(rows[b, i], cut[0])
                assert rhs[b, i] == cut[1]


@pytest.mark.parametrize("snr", [3.0, 1.0])
def test_alp_matches_exact_oracle(tiny_h, snr):
    g, _ = gf2_nullspace(tiny_h)
    key = jax.random.PRNGKey(1)
    cw = gen_random_codewords(key, g, 24)
    _, llrs = channel_llr(jax.random.fold_in(key, 2), cw, snr)
    dec = ALPDecoder(tiny_h, lp_iters=2000, max_rounds=30, int_tol=2e-2)
    res = dec.decode_batch(llrs)
    llrs_np = np.asarray(llrs, np.float64)
    agree = 0
    for t in range(24):
        bits, ok = scalar_alp(tiny_h, llrs_np[t])
        if ok == bool(res.success[t]):
            agree += 1
            if ok:
                np.testing.assert_array_equal(np.asarray(res.bits[t]), bits)
    # first-order LP vs exact simplex: certificates may differ on marginal
    # frames; require high agreement
    assert agree >= 22, f"only {agree}/24 certificate agreements"


def test_full_lp_noiseless(small_h):
    g, _ = gf2_nullspace(small_h)
    cw = gen_random_codewords(jax.random.PRNGKey(2), g, 8)
    llrs = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 6.0
    dec = FullLPDecoder(small_h, iters=1500)
    res = dec.decode_batch(jnp.asarray(llrs))
    assert bool(res.success.all())
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(cw))


def test_alp_noiseless(small_h):
    g, _ = gf2_nullspace(small_h)
    cw = gen_random_codewords(jax.random.PRNGKey(3), g, 8)
    llrs = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 6.0
    res = ALPDecoder(small_h, lp_iters=800).decode_batch(jnp.asarray(llrs))
    assert bool(res.success.all())
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(cw))


def test_agc_alp_noiseless_and_noisy(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(4)
    cw = gen_random_codewords(key, g, 16)
    llrs_clean = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 6.0
    dec = AGCALPDecoder(small_h, lp_iters=800, max_rounds=20)
    res = dec.decode_batch(jnp.asarray(llrs_clean))
    assert bool(res.success.all())
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(cw))
    # noisy: certified outputs must be codewords; AGC should certify at
    # least as many frames as plain ALP (its cuts are a superset source)
    _, llrs = channel_llr(jax.random.fold_in(key, 7), cw, 2.0)
    res_agc = dec.decode_batch(llrs)
    res_alp = ALPDecoder(small_h, lp_iters=800,
                         max_rounds=20).decode_batch(llrs)
    ok = np.asarray(res_agc.success)
    valid = np.asarray(is_codeword(jnp.asarray(small_h), res_agc.bits))
    assert valid[ok].all()
    assert ok.sum() >= np.asarray(res_alp.success).sum() - 1


def test_alp_h02_large_code_no_retuning():
    """ALP on the 520x640 H02 code must work with derived (not hardcoded)
    tier/capacity constants: noiseless lanes certify immediately, noisy
    lanes run cut rounds without overflowing, and the overflow telemetry
    reports zero drops."""
    import jax
    from ldpc_tpu.codes.io import read_pcm
    from ldpc_tpu.codes.gf2 import gf2_nullspace
    from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr
    from ldpc_tpu.decoders.alp import ALPDecoder

    h = read_pcm("data/H02.txt")
    g, ok = gf2_nullspace(h)
    assert ok
    dec = ALPDecoder(h, max_rounds=3, lp_iters=60, lp_backend="xla")
    # tier ladder derived from capacity, all 128-aligned, covers the buffer
    assert all(t % 128 == 0 for t in dec._tiers)
    assert dec._tiers[0] == 128 and dec._tiers[-1] < dec.capacity
    assert dec.capacity % 128 == 0 and dec.capacity >= dec.max_rows
    # the row budget must scale with the code: a cap <= m binds in a single
    # cut round (every check row can emit a cut) and deadlocks the loop —
    # the round-5 H02 benchmark caught the old flat 512 doing exactly that
    assert dec.max_rows >= 2 * h.shape[0]

    key = jax.random.PRNGKey(5)
    cw = gen_random_codewords(key, g, 4)
    # noiseless: box LP optimum is the codeword, zero cut rounds
    llrs = jnp.asarray(np.where(np.asarray(cw) == 0, 4.0, -4.0),
                       jnp.float32)
    r = dec.decode_batch(llrs)
    np.testing.assert_array_equal(np.asarray(r.bits), np.asarray(cw))
    assert bool(jnp.all(r.success))
    # noisy: cut rounds execute at H02 scale without drops
    _, llrs_n = channel_llr(jax.random.fold_in(key, 1), cw, 2.0)
    r2 = dec.decode_batch(llrs_n)
    assert r2.bits.shape == (4, h.shape[1])
    assert int(jnp.sum(r2.dropped)) == 0
