"""Persistent JAX compile-cache location.

First compiles through the TPU tunnel take minutes, so every entry point
enables XLA's persistent compilation cache. /tmp does not survive harness
session resets; the default cache therefore lives under the user's cache home
(`~/.cache/optispeech_tpu/jax_cache`, or `$XDG_CACHE_HOME`), overridable with
`$JAX_COMPILATION_CACHE_DIR`. No reference analogue (the torch reference has
no AOT compile step to cache; the persistent cache is what makes XLA cold
starts cheap here).
"""

import os


def compile_cache_dir() -> str:
    """Resolve (and create) the persistent compile-cache directory."""
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not d:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        d = os.path.join(base, "optispeech_tpu", "jax_cache")
    os.makedirs(d, exist_ok=True)
    return d


def enable_compile_cache() -> str:
    """Point jax at the persistent cache; returns the directory used."""
    import jax

    d = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
