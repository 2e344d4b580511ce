"""App-level smoke tests on tiny configurations (CPU mesh)."""
import os

import numpy as np
import pytest

from ldpc_tpu.config import (GridSearchConfig, OptimizeConfig, SweepConfig)


def repo_path(*parts):
    return os.path.join(os.path.dirname(__file__), "..", *parts)


def test_benchmark_sweep_smoke(tmp_path):
    from ldpc_tpu.apps.benchmark import run_sweep
    cfg = SweepConfig(matrix=repo_path("data", "H.txt"),
                      decoders=("bp",), snrs=(2.0, 4.0), trials=64,
                      batch_size=32, report=str(tmp_path / "r.csv"),
                      extended_report=str(tmp_path / "re.csv"), shard=False)
    cfg.decoder_cfg.bp_max_iter = 10
    rows = run_sweep(cfg, log=lambda *a, **k: None)
    assert len(rows) == 2
    text = (tmp_path / "r.csv").read_text().strip().split("\n")
    assert len(text) == 3
    # FER should drop with SNR
    assert rows[1][2].fer <= rows[0][2].fer


def test_grid_search_smoke(tiny_h, tmp_path):
    from ldpc_tpu.codes.io import save_matrix
    from ldpc_tpu.apps.qpadmm_grid import run_grid
    p = tmp_path / "h.txt"
    save_matrix(tiny_h, str(p))
    cfg = GridSearchConfig(matrix=str(p), trials=32, snr=2.0,
                           alpha_count=3, mu_count=4, admm_max_iter=100,
                           batch_cells=4)
    fers, best = run_grid(cfg, log=lambda *a, **k: None)
    assert len(fers) == 12
    assert 0.0 <= best[0] <= 1.0
    # infeasible cells must be exactly 1.0
    from ldpc_tpu.decoders.admm import ADMMStructure
    e_min = ADMMStructure.from_h(tiny_h).e_min
    for (a, m), fer in fers.items():
        if e_min * m <= a:
            assert fer == 1.0


def test_optimizer_smoke(tmp_path):
    from ldpc_tpu.apps.optimize_h import optimize
    cfg = OptimizeConfig(block_size=4, block_rows=2, block_cols=4,
                         trials=48, final_trials=48, snr=2.0,
                         admm_max_iter=100, generations=4, population=2,
                         seed=1,
                         save_path=str(tmp_path / "best.txt"),
                         state_path=str(tmp_path / "state.json"))
    qc, final = optimize(cfg, log=lambda *a, **k: None)
    assert 0.0 <= final <= 1.0
    assert qc.to_dense().shape == (8, 16)


def test_optimizer_resume(tmp_path):
    from ldpc_tpu.apps.optimize_h import optimize
    kw = dict(block_size=4, block_rows=2, block_cols=4, trials=32,
              final_trials=32, snr=2.0, admm_max_iter=50, population=2,
              seed=2, save_path=str(tmp_path / "best.txt"),
              state_path=str(tmp_path / "state.json"))
    optimize(OptimizeConfig(generations=2, **kw), log=lambda *a, **k: None)
    if os.path.exists(kw["state_path"]):
        # resume path must load the saved state without error
        optimize(OptimizeConfig(generations=4, **kw),
                 log=lambda *a, **k: None)


def test_optimizer_resume_keeps_persisted_best(tmp_path):
    """Regression (round-4 advisor, high): a resumed run whose chains all
    carry fer=inf (reseeded / screen-greedy accepts) must seed the global
    best from the persisted top-level record, not recompute a worse one and
    overwrite the best-matrix artifact."""
    import json
    from ldpc_tpu.apps.optimize_h import optimize
    kw = dict(block_size=4, block_rows=2, block_cols=4, trials=32,
              final_trials=32, snr=2.0, admm_max_iter=50, population=2,
              seed=3, save_path=str(tmp_path / "best.txt"),
              state_path=str(tmp_path / "state.json"))
    optimize(OptimizeConfig(generations=2, **kw), log=lambda *a, **k: None)
    with open(kw["state_path"]) as f:
        st = json.load(f)
    # simulate the flagged state: unbeatable persisted best, all-inf chains
    st["fer"] = 0.0
    for ch in st["chains"]:
        ch["fer"] = None
    with open(kw["state_path"], "w") as f:
        json.dump(st, f)
    optimize(OptimizeConfig(generations=4, **kw), log=lambda *a, **k: None)
    with open(kw["state_path"]) as f:
        st2 = json.load(f)         # strict JSON must round-trip (no Infinity)
    assert st2["fer"] == 0.0
    assert st2["present"] == st["present"]
    assert st2["shifts"] == st["shifts"]
