"""Test harness: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware. The axon sitecustomize pins JAX_PLATFORMS=axon, so the
override must go through jax.config before first backend use.

Real-hardware tier: `TCNN_TPU_TESTS=1 python -m pytest -m tpu` keeps the
TPU backend and runs the @pytest.mark.tpu suite (kernel parity at
production shapes on the bench chip)."""

import os

_ON_TPU = os.environ.get("TCNN_TPU_TESTS") == "1"
if not _ON_TPU:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # production-shape kernels take minutes to compile; amortize across
    # tier runs with the persistent cache (same dir bench.py uses)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
