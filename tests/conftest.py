"""Test harness: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware. The axon sitecustomize pins JAX_PLATFORMS=axon, so the
override must go through jax.config before first backend use."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
