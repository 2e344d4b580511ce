"""Native host core: build + exact equivalence vs the NumPy fallbacks."""
import numpy as np
import pytest

from ldpc_tpu import _native


def _lib_or_skip():
    lib = _native.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def test_native_builds():
    _lib_or_skip()


def test_nullspace_equivalence(tiny_h, small_h, opt_h):
    _lib_or_skip()
    from ldpc_tpu.codes import gf2
    for h in (tiny_h, small_h, opt_h):
        g_nat, ok_nat = _native.nullspace(h)
        # python reference path (bypass the native shortcut by inlining the
        # original numpy routine)
        import importlib, os
        os.environ["LDPC_TPU_NO_NATIVE"] = "1"
        try:
            hh = np.array(h, dtype=np.uint8) % 2
            m, n = hh.shape
            pos = np.full(m, -1, dtype=np.int64)
            is_main = np.zeros(n, dtype=bool)
            okay = True
            for i in range(m):
                nz = np.nonzero(hh[i])[0]
                if nz.size == 0:
                    okay = False
                    break
                p = nz[0]
                pos[i] = p
                mask = hh[:, p].astype(bool).copy()
                mask[i] = False
                hh[mask] ^= hh[i]
                is_main[p] = True
            assert okay == ok_nat
            free_cols = np.nonzero(~is_main)[0]
            g_py = np.zeros((n - m, n), dtype=np.uint8)
            for idx, j in enumerate(free_cols):
                g_py[idx, j] = 1
                rows = np.nonzero(hh[:, j])[0]
                g_py[idx, pos[rows]] = 1
            np.testing.assert_array_equal(g_nat, g_py)
        finally:
            del os.environ["LDPC_TPU_NO_NATIVE"]


def test_rank_equivalence(small_h):
    _lib_or_skip()
    from ldpc_tpu.codes.gf2 import gf2_rank
    assert _native.rank(small_h) == gf2_rank(small_h)
    rng = np.random.default_rng(0)
    for _ in range(5):
        h = rng.integers(0, 2, (9, 15), dtype=np.uint8)
        assert _native.rank(h) == gf2_rank(h)


def test_matmul_equivalence():
    _lib_or_skip()
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2, (13, 21), dtype=np.uint8)
    b = rng.integers(0, 2, (21, 17), dtype=np.uint8)
    expect = (a.astype(int) @ b.astype(int)) % 2
    np.testing.assert_array_equal(_native.gf2_matmul(a, b), expect)


def test_admm_build_equivalence(tiny_h, small_h, opt_h):
    _lib_or_skip()
    import os
    from ldpc_tpu.decoders.admm import ADMMStructure
    for h in (tiny_h, small_h, opt_h):
        s_nat = ADMMStructure.from_h(h)           # native path
        os.environ["LDPC_TPU_NO_NATIVE"] = "1"
        try:
            _native._tried = False
            _native._lib = None
            s_py = ADMMStructure.from_h(h)        # python path
        finally:
            del os.environ["LDPC_TPU_NO_NATIVE"]
            _native._tried = False
            _native._lib = None
        assert s_nat.n_var == s_py.n_var and s_nat.n_con == s_py.n_con
        for f in ("con_var", "con_coef", "b", "var_con", "var_coef", "e"):
            np.testing.assert_array_equal(getattr(s_nat, f), getattr(s_py, f),
                                          err_msg=f)
