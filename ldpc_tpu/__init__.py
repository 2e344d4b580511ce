"""ldpc_tpu: TPU-native LDPC decoding framework.

Enables JAX's persistent compilation cache on import: the decode programs
(tier-switched Pallas LP solves inside cut-round while-loops) cost tens of
seconds to minutes to compile, and every CLI app / sweep process pays that
again without the on-disk cache.
"""
import os as _os

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
