"""Persistent XLA compilation cache helper (SURVEY.md 5.1 adjunct).

The reference pays its kernel compilation at C++ build time; here the
analog cost is XLA/Mosaic compilation at first trace, which for the
big-table (T=2^19) binned kernels is minutes cold. JAX's persistent
compilation cache amortizes that across processes (measured ~40% off the
binned forward's second-process compile; small-config steps become
near-instant). bench.py and the TPU test tier enable it privately; this
makes the same lever a one-liner for users:

    import tcnn_tpu as tc
    tc.enable_compilation_cache()          # ~/.cache/tcnn_tpu/jax
    tc.enable_compilation_cache("/ssd/x")  # custom location
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str:
    """Turn on JAX's persistent compilation cache for this process.

    cache_dir defaults to ``$XDG_CACHE_HOME/tcnn_tpu/jax`` (or
    ``~/.cache/tcnn_tpu/jax``). Compiles faster than
    ``min_compile_secs`` are not persisted (they're cheaper to redo than
    to deserialize). Returns the directory used. Safe to call more than
    once; the last call wins.
    """
    if cache_dir is None:
        base = os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        )
        cache_dir = os.path.join(base, "tcnn_tpu", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return cache_dir
