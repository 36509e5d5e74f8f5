"""JAX persistent compilation cache setup.

The axon TPU runtime compiles remotely (tens of seconds per program, with
high variance); caching compiled executables on disk makes every repeat
invocation of the CLIs/bench start in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "dilabhelmholtzoct_tpu", "xla"
)


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    cache_dir = directory or os.environ.get(
        "DHOCT_COMPILATION_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
