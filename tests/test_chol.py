"""Differential tests for the blocked batched Cholesky
(ldpc_tpu.ops.pallas.chol_kernel) against jnp.linalg.cholesky/cho_solve.

The Pallas diagonal-block kernel runs in interpreter mode off-TPU
(conftest forces the CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.pallas.chol_kernel import (blocked_cho_solve,
                                             blocked_cholesky)

INTERP = jax.default_backend() != "tpu"


def spd(rng, b, n, cond_boost=0.0):
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    m = np.einsum("bij,bkj->bik", a, a) / n + np.eye(n, dtype=np.float32)
    if cond_boost:
        # widen the diagonal spread the way late IPM normal matrices do
        d = np.exp(rng.uniform(-cond_boost, cond_boost,
                               (b, n))).astype(np.float32)
        m = m * d[:, :, None] * d[:, None, :]
    return m


@pytest.mark.parametrize("n", [64, 128, 150, 280])
def test_factor_matches_xla(n):
    rng = np.random.default_rng(0)
    m = jnp.asarray(spd(rng, 4, n))
    fac = blocked_cholesky(m, interpret=INTERP)
    l_ref = np.asarray(jnp.linalg.cholesky(m))
    l_ours = np.asarray(fac.l)[:, :n, :n]
    scale = np.abs(l_ref).max()
    np.testing.assert_allclose(l_ours, l_ref, atol=2e-4 * scale, rtol=2e-4)


@pytest.mark.parametrize("n", [64, 150, 280])
def test_solve_matches_cho_solve(n):
    rng = np.random.default_rng(1)
    m = jnp.asarray(spd(rng, 4, n))
    r = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    fac = blocked_cholesky(m, interpret=INTERP)
    x = np.asarray(blocked_cho_solve(fac, r))
    chol = jnp.linalg.cholesky(m)
    x_ref = np.asarray(jax.scipy.linalg.cho_solve(
        (chol, True), r[..., None])[..., 0])
    np.testing.assert_allclose(x, x_ref, atol=5e-3, rtol=5e-3)
    # residual check: M x ~ r
    res = np.asarray(jnp.einsum("bij,bj->bi", m, jnp.asarray(x))) - \
        np.asarray(r)
    assert np.abs(res).max() < 1e-2


def test_ill_conditioned_diag_spread():
    """IPM-like diagonal spread (entries over ~e^{+-8}) must still factor
    to a usable solve (cho_solve-grade residual)."""
    rng = np.random.default_rng(2)
    m = jnp.asarray(spd(rng, 4, 128, cond_boost=4.0))
    r = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    fac = blocked_cholesky(m, interpret=INTERP)
    x = blocked_cho_solve(fac, r)
    chol = jnp.linalg.cholesky(m)
    x_ref = jax.scipy.linalg.cho_solve((chol, True), r[..., None])[..., 0]
    # compare solution quality (residuals), not coordinates
    res = np.abs(np.asarray(jnp.einsum("bij,bj->bi", m, x) - r)).max()
    res_ref = np.abs(np.asarray(
        jnp.einsum("bij,bj->bi", m, x_ref) - r)).max()
    assert res <= 10 * res_ref + 1e-3


def test_non_spd_lane_nans_only_that_lane():
    rng = np.random.default_rng(3)
    m_np = spd(rng, 4, 64)
    m_np[2] = -np.eye(64, dtype=np.float32)      # not SPD
    fac = blocked_cholesky(jnp.asarray(m_np), interpret=INTERP)
    l = np.asarray(fac.l)
    assert np.isnan(l[2]).any()
    for b in (0, 1, 3):
        assert np.isfinite(l[b]).all()
