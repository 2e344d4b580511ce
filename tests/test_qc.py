"""QC matrix representation tests (optimize_H.cpp:27-86 semantics)."""
import numpy as np
import pytest

from ldpc_tpu.codes.qc import QCMatrix


def test_round_trip_committed_matrix(opt_h):
    qc = QCMatrix.from_dense(opt_h, 20)
    assert (qc.to_dense() == opt_h).all()
    assert qc.present.shape == (8, 14)


def test_dense_structure():
    qc = QCMatrix(4, np.array([[True, False]]), np.array([[1, 0]]))
    h = qc.to_dense()
    assert h.shape == (4, 8)
    # shifted identity: row k has its 1 at column (1+k) % 4
    for k in range(4):
        assert h[k, (1 + k) % 4] == 1
        assert h[k].sum() == 1
    assert not h[:, 4:].any()


def test_invalid_block_rejected():
    h = np.zeros((4, 4), np.uint8)
    h[0, 0] = 1  # not a full shifted identity
    with pytest.raises(ValueError):
        QCMatrix.from_dense(h, 4)


def test_mutation_changes_one_block():
    rng = np.random.default_rng(0)
    qc = QCMatrix.random(rng, 4, 3, 5, require_regular=False)
    mut = qc.random_mutation(rng)
    diff_p = (qc.present != mut.present).sum()
    diff_s = (qc.shifts != mut.shifts) & mut.present
    assert diff_p <= 1
    assert diff_p + diff_s.sum() >= 0  # at most one block touched
    touched = np.argwhere((qc.present != mut.present) |
                          (qc.shifts != mut.shifts))
    assert len(touched) <= 1


def test_random_is_regular():
    rng = np.random.default_rng(1)
    from ldpc_tpu.codes.gf2 import gf2_nullspace
    qc = QCMatrix.random(rng, 4, 2, 4)
    _, ok = gf2_nullspace(qc.to_dense())
    assert ok
