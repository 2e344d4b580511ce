"""QP-ADMM decoder tests: exact differential oracle vs a scalar NumPy
transcription of the reference iteration (algo/qp_admm.h:104-178), structure
checks for the cascaded polytope, and precondition semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.channel.awgn import channel_llr, gen_random_codewords, llr
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.decoders.admm import ADMMStructure, QPADMMDecoder


def scalar_admm_reference(h, llr_vec, alpha, mu, max_iter, eps_stop):
    """Scalar NumPy QP-ADMM implementing the reference math directly."""
    m, n = h.shape
    # build constraints (cascade) as (vars, coefs, rhs) triples
    cons = []

    def add_three(i, j, k):
        cons.append(([i, j, k], [1, -1, -1], 0.0))
        cons.append(([i, j, k], [-1, 1, -1], 0.0))
        cons.append(([i, j, k], [-1, -1, 1], 0.0))
        cons.append(([i, j, k], [1, 1, 1], 2.0))

    pos = n
    for i in range(m):
        idx = np.nonzero(h[i])[0].tolist()
        if not idx:
            continue
        if len(idx) == 1:
            cons.append(([idx[0]], [1.0], 0.0))
            continue
        if len(idx) == 2:
            cons.append((idx, [1.0, -1.0], 0.0))
            cons.append((idx, [-1.0, 1.0], 0.0))
            continue
        last = idx[0]
        for j in range(1, len(idx) - 2):
            add_three(last, idx[j], pos)
            last = pos
            pos += 1
        add_three(last, idx[-2], idx[-1])

    n_var = pos
    q = np.zeros(n_var)
    q[:n] = llr_vec
    e = np.zeros(n_var)
    A_cols = [[] for _ in range(n_var)]
    b = np.array([c[2] for c in cons])
    for ci, (vids, cfs, _) in enumerate(cons):
        for vi, cf in zip(vids, cfs):
            A_cols[vi].append((ci, float(cf)))
            e[vi] += cf * cf
    if e.min() * mu <= alpha:
        return np.zeros(n, np.uint8), False, 0

    v = (q > 0).astype(float)
    z = np.zeros(len(cons))
    yl = np.zeros(len(cons))
    inv_coef = -1.0 / (mu * e - alpha)
    iters = max_iter
    for it in range(max_iter):
        for i in range(n_var):
            B = q[i] + alpha / 2
            for (j, cf) in A_cols[i]:
                B += cf * (yl[j] + mu * (z[j] - b[j]))
            v[i] = min(1.0, max(0.0, B * inv_coef[i]))
        r = b.copy()
        for i in range(n_var):
            for (j, cf) in A_cols[i]:
                r[j] -= cf * v[i]
        z_new = np.maximum(0.0, r - yl)
        yl = np.maximum(0.0, yl - r)
        sum2 = ((z_new - r) ** 2).sum()
        z = z_new
        if sum2 < eps_stop:
            iters = it + 1
            break
    return (v[:n] > 0.5).astype(np.uint8), True, iters


def test_structure_counts(tiny_h, small_h):
    for h in (tiny_h, small_h):
        s = ADMMStructure.from_h(h)
        degs = h.sum(1)
        n_aux = int(np.maximum(degs - 3, 0).sum())
        assert s.n_var == h.shape[1] + n_aux
        expected_cons = 0
        for d in degs:
            if d == 1:
                expected_cons += 1
            elif d == 2:
                expected_cons += 2
            elif d >= 3:
                expected_cons += 4 * (d - 2)
        assert s.n_con == expected_cons
        # e = per-variable sum of squared coefficients; all coefs are +-1
        nnz = np.zeros(s.n_var)
        for ci in range(s.n_con):
            for sl in range(3):
                if s.con_var[ci, sl] < s.n_var:
                    nnz[s.con_var[ci, sl]] += s.con_coef[ci, sl] ** 2
        np.testing.assert_allclose(nnz, s.e)


# Note: the reference's in-place v-update sweep (qp_admm.h:130-142) reads only
# yl/z/b — never other entries of v — so the batched Jacobi-style update is
# exactly equivalent; the bit-for-bit oracle test below relies on this.


def test_admm_matches_scalar_oracle(tiny_h):
    h = tiny_h
    g, _ = gf2_nullspace(h)
    key = jax.random.PRNGKey(5)
    cw = gen_random_codewords(key, g, 16)
    _, llrs = channel_llr(jax.random.fold_in(key, 2), cw, 0.0)
    alpha, mu = 1.2, 0.55
    # verify precondition holds for this structure
    s = ADMMStructure.from_h(h)
    if s.e_min * mu <= alpha:
        mu = alpha / s.e_min + 0.5
    dec = QPADMMDecoder(h, alpha=alpha, mu=mu, max_iter=300, eps_stop=1e-5)
    res = dec.decode_batch(llrs)
    llrs_np = np.asarray(llrs, np.float64)
    for t in range(16):
        bits, ok, _ = scalar_admm_reference(h, llrs_np[t], alpha, mu, 300, 1e-5)
        assert ok == bool(res.success[t])
        np.testing.assert_array_equal(np.asarray(res.bits[t]), bits,
                                      err_msg=f"trial {t}")


def test_admm_precondition_bail(tiny_h):
    # alpha too large vs mu*e_min -> all-zero, success False (qp_admm.h:108-114)
    dec = QPADMMDecoder(tiny_h, alpha=100.0, mu=0.01, max_iter=50)
    llrs = jnp.ones((4, tiny_h.shape[1]), jnp.float32)
    res = dec.decode_batch(llrs)
    assert not bool(res.success.any())
    assert not np.asarray(res.bits).any()


def test_admm_decodes_noiseless(small_h):
    g, _ = gf2_nullspace(small_h)
    cw = gen_random_codewords(jax.random.PRNGKey(2), g, 8)
    llrs = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 8.0
    dec = QPADMMDecoder(small_h, alpha=1.2, mu=0.55, max_iter=2000)
    res = dec.decode_batch(jnp.asarray(llrs))
    assert bool(res.success.all())
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(cw))


def test_traced_params_match_static(tiny_h):
    g, _ = gf2_nullspace(tiny_h)
    key = jax.random.PRNGKey(8)
    cw = gen_random_codewords(key, g, 8)
    _, llrs = channel_llr(jax.random.fold_in(key, 3), cw, 1.0)
    dec = QPADMMDecoder(tiny_h, alpha=0.5, mu=2.5, max_iter=200)
    a = dec.decode_batch(llrs)
    b = dec.decode_batch_params(llrs, jnp.float32(0.5), jnp.float32(2.5))
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.success), np.asarray(b.success))
