"""Differential tests: fused Pallas PDHG chunk vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.lp_solver import pdhg_box_lp, pdhg_steps
from ldpc_tpu.ops.pallas.pdhg_kernel import pdhg_chunk_pallas


def _combined_err(c, a, b, x, y):
    """Recompute the solvers' convergence metric:
    max(primal violation, relative duality gap) per lane."""
    ax = jnp.einsum("brn,bn->br", a, x)
    viol = jnp.max(jnp.maximum(ax - b, 0.0), axis=1)
    rc = c + jnp.einsum("brn,br->bn", a, y)
    pobj = jnp.sum(c * x, axis=1)
    dobj = -jnp.sum(b * y, axis=1) + jnp.sum(jnp.minimum(rc, 0.0), axis=1)
    gap = (pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
    return jnp.maximum(viol, gap)


def _random_lp(key, bsz=3, t_rows=128, n=280, active=40):
    """Random signed-row LP instances resembling ALP cut buffers."""
    ks = jax.random.split(key, 4)
    c = jax.random.normal(ks[0], (bsz, n), jnp.float32)
    rows = jax.random.randint(ks[1], (bsz, t_rows, n), -1, 2)
    slot = jnp.arange(t_rows)[None, :, None]
    rows = jnp.where(slot < active, rows, 0).astype(jnp.float32)
    b = jnp.abs(jax.random.normal(ks[2], (bsz, t_rows))) * 3.0
    b = jnp.where(jnp.arange(t_rows)[None] < active, b, 0.0)
    x0 = jax.random.uniform(ks[3], (bsz, n), jnp.float32)
    y0 = jnp.zeros((bsz, t_rows), jnp.float32)
    return c, rows, b, x0, y0


def test_chunk_matches_xla_fixed_iters():
    c, a, b, x0, y0 = _random_lp(jax.random.PRNGKey(0))
    iters = 150
    x_ref, y_ref = pdhg_box_lp(c, a, b, x0, y0, iters)
    tau, sigma = pdhg_steps(a)
    x_k, y_k, viol = pdhg_chunk_pallas(c, a, b, tau, sigma, x0, y0,
                                       iters=iters, interpret=True)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               atol=2e-4)
    # reported convergence error matches a recomputed one
    expect = _combined_err(c, a, b, x_k, y_k)
    np.testing.assert_allclose(np.asarray(viol), np.asarray(expect),
                               atol=1e-5)


def test_fused_solver_reaches_tolerance():
    from ldpc_tpu.ops.lp_solver import pdhg_box_lp_fused
    c, a, b, x0, y0 = _random_lp(jax.random.PRNGKey(7), bsz=2, active=24)
    x, y, viol = pdhg_box_lp_fused(c, a, b, x0, y0, iters=3000, tol=1e-3,
                                   check_every=250, interpret=True)
    x_ref, y_ref, viol_ref = pdhg_box_lp(c, a, b, x0, y0, 3000, tol=1e-3,
                                         check_every=250)
    # per-lane convergence-error report matches a recompute
    np.testing.assert_allclose(
        np.asarray(viol), np.asarray(_combined_err(c, a, b, x, y)),
        atol=1e-5)
    ax = jnp.einsum("brn,bn->br", a, x)
    ax_ref = jnp.einsum("brn,bn->br", a, x_ref)
    # same tolerance-driven trajectory: violation no worse than XLA's (+eps)
    assert (float(jnp.max(jnp.maximum(ax - b, 0.0)))
            <= float(jnp.max(jnp.maximum(ax_ref - b, 0.0))) + 1e-4)
    assert float(jnp.min(x)) >= 0.0 and float(jnp.max(x)) <= 1.0


def test_alp_decoder_pallas_interpret_matches_xla():
    """End-to-end: ALP decode with the interpreted Pallas LP backend equals
    the XLA backend bit-for-bit on a small code."""
    from ldpc_tpu.codes.io import read_pcm
    from ldpc_tpu.codes.gf2 import gf2_nullspace
    from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr
    from ldpc_tpu.decoders.alp import ALPDecoder

    h = read_pcm("data/H.txt")
    g, ok = gf2_nullspace(h)
    assert ok
    key = jax.random.PRNGKey(3)
    cw = gen_random_codewords(key, g, 8)
    _, llrs = channel_llr(jax.random.fold_in(key, 1), cw, -1.0)

    kw = dict(max_rounds=8, lp_iters=200, max_rows=96)
    d_x = ALPDecoder(h, lp_backend="xla", **kw)
    d_p = ALPDecoder(h, lp_backend="pallas-interpret", **kw)
    r_x = d_x.decode_batch(llrs)
    r_p = d_p.decode_batch(llrs)
    np.testing.assert_array_equal(np.asarray(r_x.bits), np.asarray(r_p.bits))
    np.testing.assert_array_equal(np.asarray(r_x.success),
                                  np.asarray(r_p.success))


def test_chunk_multilane_groups_match_xla():
    """bsz=8 engages the G=8 lane-group path; must equal the XLA solver."""
    c, a, b, x0, y0 = _random_lp(jax.random.PRNGKey(11), bsz=8, active=32)
    iters = 120
    x_ref, y_ref = pdhg_box_lp(c, a, b, x0, y0, iters)
    tau, sigma = pdhg_steps(a)
    x_k, y_k, viol = pdhg_chunk_pallas(c, a, b, tau, sigma, x0, y0,
                                       iters=iters, interpret=True)
    from ldpc_tpu.ops.pallas.pdhg_kernel import pick_group_size
    assert pick_group_size(8, a.shape[1], 384) == 8
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-4)


def test_chunk_active_mask_skips_groups():
    """Inactive lane groups must pass x/y through untouched with viol=0;
    active groups must still solve."""
    c, a, b, x0, y0 = _random_lp(jax.random.PRNGKey(13), bsz=4, active=32)
    tau, sigma = pdhg_steps(a)
    # groups of G=4 -> one group; make lanes 0-3 inactive => whole grid skips
    act_none = jnp.zeros((4,), bool)
    x_s, y_s, v_s = pdhg_chunk_pallas(c, a, b, tau, sigma, x0, y0,
                                      iters=50, active=act_none,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(x_s), np.asarray(x0))
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y0))
    np.testing.assert_array_equal(np.asarray(v_s), np.zeros(4, np.float32))
    # one active lane keeps the whole group solving (group granularity)
    act_one = jnp.array([False, True, False, False])
    x_a, _, _ = pdhg_chunk_pallas(c, a, b, tau, sigma, x0, y0,
                                  iters=50, active=act_one, interpret=True)
    x_ref, _ = pdhg_box_lp(c, a, b, x0, y0, 50)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_ref), atol=2e-5)


def test_averaged_chunk_matches_xla():
    """best-of(last, chunk-average) restarts: the fused kernel and the XLA
    path must pick identical per-lane iterates."""
    from ldpc_tpu.ops.lp_solver import pdhg_box_lp_fused
    c, a, b, x0, y0 = _random_lp(jax.random.PRNGKey(21), bsz=4, active=32)
    x, y, v = pdhg_box_lp_fused(c, a, b, x0, y0, iters=900, tol=1e-6,
                                check_every=300, average=True,
                                interpret=True)
    x_r, y_r, v_r = pdhg_box_lp(c, a, b, x0, y0, 900, tol=1e-6,
                                check_every=300, average=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_r), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), atol=3e-5)
