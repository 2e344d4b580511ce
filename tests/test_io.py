"""I/O round-trip tests (utils/parse_data.h format compatibility)."""
import numpy as np

from ldpc_tpu.codes.io import read_pcm, save_matrix


def test_read_pcm_committed_assets(opt_h, small_h):
    assert opt_h.shape == (160, 280)
    assert small_h.shape == (64, 128)
    assert set(np.unique(opt_h)) <= {0, 1}


def test_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2, (11, 23), dtype=np.uint8)
    p = tmp_path / "h.txt"
    save_matrix(h, str(p))
    assert (read_pcm(str(p)) == h).all()


def test_trailing_comma_tolerated(tmp_path):
    p = tmp_path / "h.txt"
    p.write_text("1,0,1,\n0,1,1,\n")
    assert (read_pcm(str(p)) == [[1, 0, 1], [0, 1, 1]]).all()


def test_codewords_fixture_valid():
    """The committed data/codewords.txt fixture (the reference ships the
    same asset): 10k length-128 words, every one a codeword of data/H.txt."""
    import os
    from ldpc_tpu.codes.io import read_codewords
    from ldpc_tpu.codes.gf2 import is_codeword
    root = os.path.join(os.path.dirname(__file__), "..", "data")
    cw = read_codewords(os.path.join(root, "codewords.txt"))
    h = read_pcm(os.path.join(root, "H.txt"))
    assert cw.shape == (10000, 128)
    assert bool(np.asarray(is_codeword(h, cw)).all())
