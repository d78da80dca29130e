"""Persistent compilation cache — the FFTW-wisdom analogue.

The reference persists FFTW plans to fftw_wisdom.dat so restarts skip
planning (/root/reference/rtlsdr_ft8d.c:314-319,342-345). The JAX
equivalent is the persistent compilation cache: first-run XLA compiles
(~10-40 s for the decode graph) are written to disk and restart in
milliseconds.
"""

import os


def enable_compilation_cache(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tpu_ft8d_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
