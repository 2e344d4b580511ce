"""Test configuration: force an 8-virtual-device CPU platform so sharding
logic is exercised without TPU hardware, as SURVEY.md §4 prescribes."""
import os

# Hard override: the surrounding environment may register a TPU platform
# plugin at interpreter start (sitecustomize) and set the *config-level*
# jax_platforms, which trumps the JAX_PLATFORMS env var. Unit tests always run
# on an 8-virtual-device CPU mesh, so re-override at the config level before
# any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_h():
    """The committed 64x128 fixture matrix (data/H.txt)."""
    from ldpc_tpu.codes.io import read_pcm
    return read_pcm(os.path.join(os.path.dirname(__file__), "..", "data", "H.txt"))


@pytest.fixture(scope="session")
def opt_h():
    from ldpc_tpu.codes.io import read_pcm
    return read_pcm(os.path.join(os.path.dirname(__file__), "..", "data", "optimalH.txt"))


@pytest.fixture(scope="session")
def tiny_h():
    """A tiny hand-checkable (3, 7) Hamming-style parity-check matrix."""
    return np.array(
        [[1, 1, 0, 1, 1, 0, 0],
         [1, 0, 1, 1, 0, 1, 0],
         [0, 1, 1, 1, 0, 0, 1]], dtype=np.uint8)
