"""VT_PIPELINE probe: fused train step with the cross-tile index-math
pipeline on vs off, config_hash b=2^18 (production schedule vt/bcast),
plus the forward-only kernel if/when it grows the same treatment.
Checks grad parity (scratch roundtrip is exact -> bit-identical)."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
from tcnn_tpu.ops.pallas import train_kernel as tk

B = 1 << int(os.environ.get("TCNN_LOG2_B", "18"))


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[:1]


def main():
    tm = tc.create_from_config(
        2, 3, tc.load_config("/root/repo/data/config_hash.json")
    )
    model, trainer = tm.network, tm.trainer
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    t = jax.random.uniform(jax.random.PRNGKey(4), (B, 3))
    p = trainer.state["params"]
    loss = trainer.loss_fn
    tk.PICK_VARIANT, tk.VT_PICK, tk.RECOMPUTE_MASKS = "vt", "sum", False
    tk.VT_LOMASK = "bcast"

    ref = None
    for pipe, div in ((False, 2), (True, 2), (True, 4), (True, 1)):
        tk.VT_PIPELINE, tk.FUSED_TILE_DIV = pipe, div
        f = jax.jit(
            lambda pp, xx, tt: tk.fused_train_grads(model, loss, pp, xx, tt,
                                                    128.0)
        )
        try:
            t0 = time.time()
            out = f(p, x, t)
            sync(out)
            comp = time.time() - t0
            t0 = time.time()
            for _ in range(30):
                out = f(p, x, t)
            sync(out)
            dt = (time.time() - t0) / 30
            _, g = out
            if ref is None:
                ref = np.asarray(g)
                err = 0.0
            else:
                err = float(np.abs(np.asarray(g) - ref).max())
            print(f"train pipeline={pipe} div={div}: {dt*1e3:.2f} ms/step "
                  f"(compile {comp:.0f}s, grad max-abs vs off {err:.1e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train pipeline={pipe} div={div}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
