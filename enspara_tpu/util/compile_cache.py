"""Persistent XLA compilation cache.

The engine's fused while_loops take tens of seconds to compile on TPU;
caching compiled executables on disk makes that a once-per-machine cost.
Enabled automatically by the apps and bench harness; set
``ENSPARA_TPU_CACHE_DIR`` to override the location or ``0`` to disable.
"""

import os

_DEFAULT = os.path.expanduser('~/.cache/enspara_tpu_xla')


def enable_compilation_cache(path=None):
    loc = path or os.environ.get('ENSPARA_TPU_CACHE_DIR', _DEFAULT)
    if loc == '0':
        return
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', loc)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass
