"""Data-parallel scaling harness: samples/s at 1..N devices.

The BASELINE.md deliverable: >90% linear samples/s scaling over the mesh.
On a CPU host this runs with virtual devices (functional check + relative
efficiency); on a multi-chip TPU slice it measures real ICI scaling. Run
under `JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
for the virtual mesh, or directly on a pod slice.

For real multi-host use, call jax.distributed.initialize() first (see
tcnn_tpu.parallel.data_parallel docstring).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Run on real TPU only when explicitly requested (a pod slice); otherwise
# the 8-virtual-device CPU mesh. Both settings must land before backend
# init - the axon sitecustomize overwrites XLA_FLAGS at interpreter
# start, so the device count goes through jax.config.
if os.environ.get("TCNN_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from tcnn_tpu.parallel.data_parallel import DataParallelTrainer, create_mesh

PER_DEVICE_BATCH = 1 << 14
STEPS = 30


def measure(n_devices: int) -> float:
    devices = jax.devices()[:n_devices]
    mesh = create_mesh(devices)
    cfg = tc.load_config(
        os.path.join(os.path.dirname(__file__), "..", "data", "config_hash.json")
    )
    model = tc.create_from_config(2, 3, cfg)
    dp = DataParallelTrainer(model.trainer, mesh)
    state = dp.replicate(model.trainer.state)

    b = PER_DEVICE_BATCH * n_devices
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(b, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(b, 3)), jnp.float32)

    state, loss = dp.step(state, x, t)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = dp.step(state, x, t)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return STEPS * b / dt


def main():
    n_max = len(jax.devices())
    counts = sorted({1, 2, n_max} | {c for c in (4, 8) if c <= n_max})
    results = {}
    base = None
    for n in counts:
        tp = measure(n)
        if base is None:
            base = tp
        eff = tp / (base * n)
        results[n] = {"samples_per_sec": round(tp, 1), "efficiency": round(eff, 4)}
        print(f"devices={n}: {tp/1e6:.2f} M samples/s, scaling eff {eff:.2%}",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
