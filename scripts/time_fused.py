"""Quick timing of the fused train kernel (config_hash b=2^18) on TPU.

Usage: python scripts/time_fused.py [tile_override]
Prints one line: fused kernel ms + M samples/s. For fast iteration on
kernel-structure experiments (PERF.md round-3 notes).
"""
import os
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
from tcnn_tpu.ops.pallas.train_kernel import fused_train_grads

B = 1 << int(os.environ.get("TF_LOG2_B", "18"))


def timeit(fn, *args, iters=50):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters


def main():
    config = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    tr = m.trainer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    params = tr.state["params"]

    f = jax.jit(
        lambda p, xx, tt: fused_train_grads(
            m.network, tr.loss_fn, p, xx, tt, tr.loss_scale
        )
    )
    t0 = time.perf_counter()
    loss, grads = f(params, x, t)
    np.asarray(loss)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s")
    dt = timeit(f, params, x, t)
    print(f"fused kernel: {dt*1e3:.2f} ms = {B/dt/1e6:.2f} M samples/s")
    print(f"loss={float(loss):.5f} gsum={float(jnp.sum(jnp.abs(grads))):.4f}")


if __name__ == "__main__":
    main()
