"""Common JAX runtime initialization for CLIs and benchmarks."""

import pathlib

_CACHE_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"


def setup(compilation_cache: bool = True):
    """Enable the persistent compilation cache (compiles of the frame
    function and IBL precompute take tens of seconds on this host)."""
    import jax
    if compilation_cache:
        _CACHE_DIR.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
