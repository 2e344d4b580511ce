"""Experiment harness tests: counter semantics, sharded execution on the
8-virtual-device CPU mesh, CSV format."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.channel.awgn import gen_random_codewords
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.decoders.bp import BPDecoder
from ldpc_tpu.harness.experiment import ExperimentResult, run_experiment
from ldpc_tpu.harness.report import ReportWriter, REFERENCE_HEADER
from ldpc_tpu.parallel.mesh import make_trial_mesh


def test_counters_and_fer(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(0)
    cw = np.asarray(gen_random_codewords(key, g, 96))
    dec = BPDecoder(small_h, max_iter=20)
    res = run_experiment(dec, small_h, cw, snr=3.0, key=key, batch_size=32)
    assert res.total == 96
    assert 0 <= res.correct <= 96
    assert res.fer == (96 - res.correct) / 96
    assert res.correct + res.pseudo <= res.total
    assert res.sum_hamming == res.sum_hamming_ok + res.sum_hamming_wrong
    # at 3 dB the 64x128 code should decode most frames
    assert res.fer < 0.5


def test_determinism_across_batch_sizes(small_h):
    """Counters must not depend on batch partitioning (per-trial keys are
    index-derived, replacing the reference's order-independent seeding)."""
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(1)
    cw = np.asarray(gen_random_codewords(key, g, 64))
    dec = BPDecoder(small_h, max_iter=15)
    r1 = run_experiment(dec, small_h, cw, snr=1.0, key=key, batch_size=64)
    r2 = run_experiment(dec, small_h, cw, snr=1.0, key=key, batch_size=16)
    assert (r1.correct, r1.pseudo, r1.sum_hamming) == \
           (r2.correct, r2.pseudo, r2.sum_hamming)


def test_sharded_run_matches_single(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(2)
    cw = np.asarray(gen_random_codewords(key, g, 64))
    dec = BPDecoder(small_h, max_iter=15)
    sharding = make_trial_mesh()
    assert sharding.num_devices == 8
    r_sharded = run_experiment(dec, small_h, cw, snr=0.0, key=key,
                               batch_size=64, sharding=sharding)
    r_single = run_experiment(dec, small_h, cw, snr=0.0, key=key,
                              batch_size=64)
    assert (r_sharded.correct, r_sharded.pseudo, r_sharded.sum_hamming) == \
           (r_single.correct, r_single.pseudo, r_single.sum_hamming)


def test_remainder_batch(small_h):
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(3)
    cw = np.asarray(gen_random_codewords(key, g, 50))  # not divisible by 32
    dec = BPDecoder(small_h, max_iter=10)
    res = run_experiment(dec, small_h, cw, snr=2.0, key=key, batch_size=32)
    assert res.total == 50


def test_report_format(tmp_path, small_h):
    res = ExperimentResult(total=100, correct=80, pseudo=2, sum_hamming=500,
                           sum_hamming_ok=300, sum_hamming_wrong=200,
                           time_sec=1.5)
    p = tmp_path / "report.csv"
    with ReportWriter(str(p)) as w:
        w.write_row("BP", -3.0, res)
    lines = p.read_text().strip().split("\n")
    assert lines[0] == REFERENCE_HEADER
    cells = lines[1].split(",")
    assert cells[0] == "BP"
    assert float(cells[1]) == -3.0
    assert np.isclose(float(cells[2]), np.sqrt(10 ** 0.3 / 2))
    assert np.isclose(float(cells[3]), 0.2)       # FER
    assert np.isclose(float(cells[5]), 5.0)       # AvgHamming
    assert np.isclose(float(cells[6]), 300 / 80)  # AvgHammingCorrect
    assert np.isclose(float(cells[7]), 200 / 20)  # AvgHammingWrong


def test_streaming_matches_batched(small_h):
    """The streaming (drain-and-refill) harness must produce the exact
    counters of the batched path: identical per-trial noise (index-derived
    keys) and identical per-lane solver numerics (shared _admm_setup
    iter_fn), so only scheduling differs."""
    from ldpc_tpu.decoders.admm import QPADMMDecoder
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(4)
    cw = np.asarray(gen_random_codewords(key, g, 90))
    dec = QPADMMDecoder(small_h, max_iter=600)
    dec.stream_chunk_iters = 64
    r_b = run_experiment(dec, small_h, cw, snr=0.0, key=key,
                         batch_size=32, streaming=False)
    r_s = run_experiment(dec, small_h, cw, snr=0.0, key=key,
                         batch_size=32, streaming=True)
    assert r_s.total == 90
    assert (r_s.correct, r_s.pseudo, r_s.sum_hamming, r_s.sum_hamming_ok,
            r_s.sum_hamming_wrong, r_s.sum_iterations) == \
           (r_b.correct, r_b.pseudo, r_b.sum_hamming, r_b.sum_hamming_ok,
            r_b.sum_hamming_wrong, r_b.sum_iterations)
    # trial count not divisible by batch: padded tail lanes must not leak
    r_s2 = run_experiment(dec, small_h, cw[:70], snr=0.0, key=key,
                          batch_size=32, streaming=True)
    r_b2 = run_experiment(dec, small_h, cw[:70], snr=0.0, key=key,
                          batch_size=32, streaming=False)
    assert r_s2.total == 70 and r_s2.correct == r_b2.correct


def test_streaming_matches_batched_alp(small_h):
    """Same equality for the ALP family (chunk = one cut round): refilled
    lanes restart mid-batch with their own round budgets, so scheduling
    differs but per-trial results must not."""
    from ldpc_tpu.decoders.alp import ALPDecoder
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(5)
    cw = np.asarray(gen_random_codewords(key, g, 60))
    dec = ALPDecoder(small_h, max_rounds=12)
    r_b = run_experiment(dec, small_h, cw, snr=2.0, key=key,
                         batch_size=16, streaming=False)
    r_s = run_experiment(dec, small_h, cw, snr=2.0, key=key,
                         batch_size=16, streaming=True)
    assert r_s.total == 60
    assert (r_s.correct, r_s.pseudo, r_s.sum_hamming, r_s.sum_iterations,
            r_s.sum_dropped) == \
           (r_b.correct, r_b.pseudo, r_b.sum_hamming, r_b.sum_iterations,
            r_b.sum_dropped)


def test_scan_fused_matches_host_loop(small_h):
    """The single-device scan-fused runner (trials divisible by batch) must
    produce identical counters to the host-loop path (forced here via a
    non-dividing batch size over the same trial set)."""
    g, _ = gf2_nullspace(small_h)
    key = jax.random.PRNGKey(5)
    cw = np.asarray(gen_random_codewords(key, g, 96))
    dec = BPDecoder(small_h, max_iter=15)
    fused = run_experiment(dec, small_h, cw, snr=1.0, key=key,
                           batch_size=32)          # 96 % 32 == 0 -> scan
    hostl = run_experiment(dec, small_h, cw, snr=1.0, key=key,
                           batch_size=36)          # 96 % 36 != 0 -> loop
    for f in ("total", "correct", "pseudo", "sum_hamming",
              "sum_hamming_ok", "sum_hamming_wrong", "sum_iterations"):
        assert getattr(fused, f) == getattr(hostl, f), f
