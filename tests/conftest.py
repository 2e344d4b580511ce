"""Test configuration: force an 8-virtual-device CPU platform so sharding
logic is exercised without TPU hardware, as SURVEY.md §4 prescribes."""
import os

# Hard override: the surrounding environment may point JAX at a TPU platform
# (e.g. JAX_PLATFORMS=axon); unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
