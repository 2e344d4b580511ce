"""PDHG LP solver accuracy tests against scipy.optimize.linprog (HiGHS)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linprog

from ldpc_tpu.ops.lp_solver import pdhg_box_lp, pdhg_box_lp_shared


def random_feasible_lp(rng, n, r):
    """Random box LP with inequality rows guaranteed feasible (x=0)."""
    a = rng.integers(-1, 2, (r, n)).astype(np.float32)
    b = np.maximum(0.0, a @ np.zeros(n)) + rng.uniform(0.5, 2.0, r)
    c = rng.normal(size=n).astype(np.float32)
    return c, a, b.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pdhg_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n, r = 12, 8
    c, a, b = random_feasible_lp(rng, n, r)
    ref = linprog(c, A_ub=a, b_ub=b, bounds=[(0, 1)] * n, method="highs")
    assert ref.status == 0
    x0 = jnp.zeros((1, n), jnp.float32)
    y0 = jnp.zeros((1, r), jnp.float32)
    x, _ = pdhg_box_lp(jnp.asarray(c)[None], jnp.asarray(a)[None],
                       jnp.asarray(b)[None], x0, y0, iters=4000)
    obj = float(c @ np.asarray(x[0]))
    assert obj <= ref.fun + 1e-2
    # feasibility
    assert (a @ np.asarray(x[0]) <= b + 1e-2).all()


def test_pdhg_shared_matches_batched():
    rng = np.random.default_rng(3)
    n, r, bsz = 10, 6, 4
    c, a, b = random_feasible_lp(rng, n, r)
    cs = jnp.asarray(np.tile(c, (bsz, 1)))
    x0 = jnp.zeros((bsz, n), jnp.float32)
    y0 = jnp.zeros((bsz, r), jnp.float32)
    xb, _ = pdhg_box_lp(cs, jnp.tile(jnp.asarray(a)[None], (bsz, 1, 1)),
                        jnp.tile(jnp.asarray(b)[None], (bsz, 1)),
                        x0, y0, iters=1500)
    xs, _ = pdhg_box_lp_shared(cs, jnp.asarray(a), jnp.asarray(b),
                               x0, y0, iters=1500)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xs), atol=1e-4)


def test_pdhg_inactive_rows_are_inert():
    """All-zero rows with rhs 0 must not perturb the solution (cut-buffer
    padding invariant)."""
    rng = np.random.default_rng(4)
    n, r = 8, 4
    c, a, b = random_feasible_lp(rng, n, r)
    pad = np.zeros((6, n), np.float32)
    a2 = np.concatenate([a, pad])
    b2 = np.concatenate([b, np.zeros(6, np.float32)])
    x0 = jnp.zeros((1, n), jnp.float32)
    x1, _ = pdhg_box_lp(jnp.asarray(c)[None], jnp.asarray(a)[None],
                        jnp.asarray(b)[None], x0,
                        jnp.zeros((1, r), jnp.float32), iters=2000)
    x2, _ = pdhg_box_lp(jnp.asarray(c)[None], jnp.asarray(a2)[None],
                        jnp.asarray(b2)[None], x0,
                        jnp.zeros((1, r + 6), jnp.float32), iters=2000)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
