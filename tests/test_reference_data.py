"""Unit tests for the golden-curve tables and parity statistics."""
import math

import pytest

from ldpc_tpu.harness.reference_data import (REF_FER_H05, REF_FER_OPT,
                                             SNR_GRID, ref_fer,
                                             suggested_trials, z_score)


def test_tables_complete():
    for table in (REF_FER_OPT, REF_FER_H05):
        assert set(table) == {"BP", "QP-ADMM", "ALP", "AGC-ALP"}
        for curve in table.values():
            assert len(curve) == len(SNR_GRID) == 11
            assert all(0.0 <= p <= 1.0 for p in curve)
            # FER decreases with SNR except the BP error floor, which rises
            # slightly at the top of the grid (see VALIDATION.md) — allow
            # small upticks only
            assert all(a >= b - 0.006 for a, b in zip(curve, curve[1:]))


def test_ref_fer_lookup():
    assert ref_fer("optimalH", "BP", -3.0) == 0.4860
    assert ref_fer("H05", "QP-ADMM", -3.0) == 0.3380
    with pytest.raises(ValueError):
        ref_fer("optimalH", "BP", -3.25)


def test_z_score_basics():
    assert z_score(0.5, 10000, 0.5) == 0.0
    assert z_score(0.0, 1000, 0.0) == 0.0
    # pooled-variance z stays finite when only one side observed errors,
    # and is far beyond any plausible acceptance bound
    assert z_score(0.1, 1000, 0.0) > 30.0
    # symmetric sign
    assert z_score(0.52, 10000, 0.5) == pytest.approx(
        -z_score(0.48, 10000, 0.5))
    # a 2-sigma-ish case: p=0.5, n=10000 each, diff 0.02 -> z ~ 2.83
    assert z_score(0.52, 10000, 0.50) == pytest.approx(2.83, abs=0.02)


def test_suggested_trials_power_matched():
    assert suggested_trials(0.97) == 2000
    assert suggested_trials(0.2) == 4000
    assert suggested_trials(0.01) == 10000
