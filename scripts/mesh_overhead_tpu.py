"""Mesh overhead on the real chip: bare trainer step vs 1-device-mesh step.

The only real-hardware scaling measurement available on a single-chip
machine (BASELINE.md asks for 1 chip / 1 host / N hosts; N needs a pod
slice). Updates benchmarks/results/scaling_r3.json in place.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
from tcnn_tpu.parallel.data_parallel import DataParallelTrainer, create_mesh

B = 1 << 18


def timeit(fn, *args, iters=40):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    out = args
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters


def main():
    cfg = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, cfg)
    tr = m.trainer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    bare = jax.jit(lambda s, xx, tt: tr.train_step_fn(s, xx, tt))
    dt_bare = timeit(bare, tr.state, x, t)
    print(f"bare step: {dt_bare*1e3:.2f} ms", flush=True)

    mesh = create_mesh(jax.devices()[:1])
    dp = DataParallelTrainer(tr, mesh)
    state = dp.replicate(tr.state)
    dt_mesh = timeit(lambda s: dp.step(s, x, t)[0], state)
    print(f"1-device-mesh step: {dt_mesh*1e3:.2f} ms", flush=True)

    path = "/root/repo/benchmarks/results/scaling_r3.json"
    data = json.load(open(path))
    data["tpu_single_chip_mesh"]["bare_step_ms"] = round(dt_bare * 1e3, 2)
    data["tpu_single_chip_mesh"]["mesh1_step_ms"] = round(dt_mesh * 1e3, 2)
    data["tpu_single_chip_mesh"]["overhead_pct"] = round(
        (dt_mesh / dt_bare - 1) * 100, 2
    )
    json.dump(data, open(path, "w"), indent=2)
    print("updated", path)


if __name__ == "__main__":
    main()
