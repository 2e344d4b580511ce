"""Batched GF(2) elimination tests vs a scalar transcription of
CalculateGauss (algo/agc_alp.h:19-74)."""
import numpy as np
import jax.numpy as jnp

from ldpc_tpu.ops.gf2_gauss import calculate_gauss_batched, \
    fractional_column_order


def scalar_calculate_gauss(h0, u, eps=1e-8):
    """Direct NumPy transcription of the reference algorithm."""
    h0 = np.asarray(h0, np.uint8)
    u = np.asarray(u, float)
    n = len(u)
    non_int = [i for i in range(n) if eps <= u[i] <= 1 - eps]
    zeros = [i for i in range(n) if u[i] < eps]
    ones = [i for i in range(n) if u[i] > 1 - eps]
    non_int.sort(key=lambda i: abs(u[i] - 0.5))  # python sort is stable
    p = non_int + zeros + ones
    p_inv = np.empty(n, int)
    for i, pi in enumerate(p):
        p_inv[pi] = i
    h = h0[:, p].copy()
    m = h.shape[0]
    col = 0
    for i in range(m):
        while col < n:
            found = False
            for t in range(i, m):
                if h[t, col]:
                    h[[i, t]] = h[[t, i]]
                    found = True
                    break
            if found:
                break
            col += 1
        assert col < n
        piv = col
        col += 1
        for k in range(m):
            if k != i and h[k, piv]:
                h[k] ^= h[i]
    return h[:, p_inv]


def test_column_order_matches(tiny_h):
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 1, (3, 7)).astype(np.float32)
    u[0, 2] = 0.0  # integral zero
    u[1, 4] = 1.0  # integral one
    p = np.asarray(fractional_column_order(jnp.asarray(u), 1e-8))
    for b in range(3):
        ub = u[b]
        non_int = sorted([i for i in range(7) if 1e-8 <= ub[i] <= 1 - 1e-8],
                         key=lambda i: abs(ub[i] - 0.5))
        zeros = [i for i in range(7) if ub[i] < 1e-8]
        ones = [i for i in range(7) if ub[i] > 1 - 1e-8]
        np.testing.assert_array_equal(p[b], non_int + zeros + ones)


def test_gauss_matches_scalar(small_h):
    rng = np.random.default_rng(1)
    bsz = 4
    u = rng.uniform(0.0, 1.0, (bsz, small_h.shape[1])).astype(np.float32)
    u[0, :40] = 0.0
    u[1, 10:30] = 1.0
    out = np.asarray(calculate_gauss_batched(jnp.asarray(small_h),
                                             jnp.asarray(u), 1e-8))
    for b in range(bsz):
        expect = scalar_calculate_gauss(small_h, u[b])
        np.testing.assert_array_equal(out[b], expect, err_msg=f"lane {b}")


def test_gauss_preserves_row_space(small_h):
    """The eliminated matrix must have the same GF(2) row space: every
    original row must be a combination of eliminated rows and vice versa —
    checked via equal rank of stacked matrices."""
    from ldpc_tpu.codes.gf2 import gf2_rank
    rng = np.random.default_rng(2)
    u = rng.uniform(0, 1, (2, small_h.shape[1])).astype(np.float32)
    out = np.asarray(calculate_gauss_batched(jnp.asarray(small_h),
                                             jnp.asarray(u), 1e-8))
    r0 = gf2_rank(small_h)
    for b in range(2):
        stacked = np.concatenate([small_h, out[b]])
        assert gf2_rank(out[b]) == r0
        assert gf2_rank(stacked) == r0


def test_pallas_elimination_matches_xla(small_h):
    """The VMEM-resident Pallas elimination (interpret mode off-TPU) must be
    bit-identical to the XLA fori-loop path on permuted real-code rows."""
    from ldpc_tpu.ops.gf2_gauss import gf2_eliminate_ordered
    from ldpc_tpu.ops.pallas.gauss_kernel import gf2_eliminate_pallas
    import jax

    rng = np.random.default_rng(3)
    bsz = 4
    u = rng.uniform(0.0, 1.0, (bsz, small_h.shape[1])).astype(np.float32)
    p = np.asarray(fractional_column_order(jnp.asarray(u)))
    h_perm = np.stack([small_h[:, p[b]] for b in range(bsz)]).astype(np.uint8)
    ref = np.asarray(gf2_eliminate_ordered(jnp.asarray(h_perm)))
    out = np.asarray(gf2_eliminate_pallas(jnp.asarray(h_perm),
                                          interpret=True))
    np.testing.assert_array_equal(out, ref)
    # active-mask: inactive groups pass through unreduced
    act = jnp.zeros((bsz,), bool)
    thru = np.asarray(gf2_eliminate_pallas(jnp.asarray(h_perm), act,
                                           interpret=True))
    np.testing.assert_array_equal(thru, h_perm)
