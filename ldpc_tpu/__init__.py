"""ldpc_tpu: TPU-native LDPC decoding framework.

Enables JAX's persistent compilation cache on import: the decode programs
(tier-switched Pallas LP solves inside cut-round while-loops) cost tens of
seconds to minutes to compile, and every CLI app / sweep process pays that
again without the on-disk cache.
"""
import os as _os
import tempfile as _tempfile

import jax as _jax

# Respect a cache dir already configured programmatically (before this
# import) or via env; otherwise default to a per-user path so multi-user
# hosts neither collide nor hit permission errors on a shared /tmp entry.
if not _jax.config.jax_compilation_cache_dir:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_tempfile.gettempdir(),
                          f"jaxcache-{_os.getuid()}")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
