"""Differential tests: Pallas batched-GEMV kernel vs the HIGHEST einsums,
and the IPM matvec backends against each other (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.ipm_solver import ipm_box_lp
from ldpc_tpu.ops.pallas.gemv_kernel import (batched_gemv, batched_gemv_t,
                                             prepare_gemv)


@pytest.mark.parametrize("bsz,t_rows,n", [(4, 128, 280), (8, 256, 84),
                                          (2, 384, 96)])
def test_gemv_matches_highest_einsum(bsz, t_rows, n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-1, 2, (bsz, t_rows, n)).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(bsz, n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(bsz, t_rows)).astype(np.float32))
    at = prepare_gemv(a)
    hi = jax.lax.Precision.HIGHEST
    y_ref = jnp.einsum("brn,bn->br", a, x, precision=hi,
                       preferred_element_type=jnp.float32)
    z_ref = jnp.einsum("brn,br->bn", a, y, precision=hi,
                       preferred_element_type=jnp.float32)
    y_k = batched_gemv(at, x, interpret=True)
    z_k = batched_gemv_t(at, y, n, interpret=True)
    # kernel math is plain f32 multiply-accumulate on an exactly-bf16 A:
    # agreement at f32 round-off scale
    assert float(jnp.max(jnp.abs(y_k - y_ref))) <= 1e-4 * float(
        1 + jnp.max(jnp.abs(y_ref)))
    assert float(jnp.max(jnp.abs(z_k - z_ref))) <= 1e-4 * float(
        1 + jnp.max(jnp.abs(z_ref)))
    assert y_k.shape == (bsz, t_rows) and z_k.shape == (bsz, n)


def test_ipm_matvec_backend_parity():
    """The pallas matvec path must reproduce the xla path's solutions on a
    batch of small box LPs (both run the incremental-ax Newton loop)."""
    rng = np.random.default_rng(1)
    bsz, t_rows, n = 4, 128, 40
    a = jnp.asarray(rng.integers(-1, 2, (bsz, t_rows, n)).astype(np.float32))
    b = jnp.asarray((np.abs(rng.normal(size=(bsz, t_rows))) * 2 + 0.5)
                    .astype(np.float32))
    c = jnp.asarray(rng.normal(size=(bsz, n)).astype(np.float32))
    x1, y1, e1 = ipm_box_lp(c, a, b, iters=30, tol=1e-6,
                            matvec_backend="xla")
    x2, y2, e2 = ipm_box_lp(c, a, b, iters=30, tol=1e-6,
                            matvec_backend="pallas-interpret")
    assert float(jnp.max(jnp.abs(x1 - x2))) < 5e-3
    obj1 = jnp.sum(c * x1, axis=-1)
    obj2 = jnp.sum(c * x2, axis=-1)
    assert float(jnp.max(jnp.abs(obj1 - obj2))) < 1e-3 * float(
        1 + jnp.max(jnp.abs(obj1)))
