"""Internal phase ablation of the fused train kernel (train_kernel.ABLATE)
at the production schedule (v3b, tile 256, cached masks), config_hash
b=2^18. Each stage includes all previous stages; deltas bound the phase
costs (co-scheduling means they are not strictly additive - the real
kernel hides builds under matmuls)."""
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
from tcnn_tpu.ops.pallas import train_kernel as tk

B = 1 << int(os.environ.get("TCNN_LOG2_B", "18"))
VARIANT = os.environ.get("TCNN_ABL_VARIANT", "v3b")

tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT = False, 4, VARIANT


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[:1]


def main():
    tm = tc.create_from_config(
        2, 3, tc.load_config("/root/repo/data/config_hash.json")
    )
    model, trainer = tm.network, tm.trainer
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    t = jax.random.uniform(jax.random.PRNGKey(4), (B, 3))
    params = trainer.state["params"]
    loss = trainer.loss_fn

    stages = ["index", "masks", "gather", "pick", "mlpfwd", "lossg",
              "mlpbwd", ""]
    prev = 0.0
    for stage in stages:
        tk.ABLATE = stage
        f = jax.jit(
            lambda p, xx, tt: tk.fused_train_grads(
                model, loss, p, xx, tt, 128.0
            )
        )
        try:
            out = f(params, x, t)
            sync(out)
            t0 = time.time()
            for _ in range(30):
                out = f(params, x, t)
            sync(out)
            dt = (time.time() - t0) / 30
            name = stage or "full"
            print(f"{name:8s}: {dt*1e3:7.2f} ms  (+{(dt-prev)*1e3:6.2f})",
                  flush=True)
            prev = dt
        except Exception as e:  # noqa: BLE001
            print(f"{stage or 'full'}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)
    tk.ABLATE = ""


if __name__ == "__main__":
    main()
