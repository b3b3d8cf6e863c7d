"""vt (transposed) fused train kernel vs v3b on the real chip:
compile + parity + speed at config_hash b=2^18, tiles 256/512."""
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

    ref = None
    for variant, div, pick, rec in (
        ("vt", 2, "mm", False), ("vt", 2, "sum", False),
        ("vt", 4, "sum", False), ("vt", 1, "sum", False),
        ("vt", 1, "sum", True), ("vt", 2, "sum", True),
    ):
        oh = pick
        tk.PICK_VARIANT, tk.FUSED_TILE_DIV, tk.RECOMPUTE_MASKS = (
            variant, div, rec,
        )
        tk.VT_PICK = pick
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
            lv, g = out
            if ref is None:
                ref = (np.asarray(lv), np.asarray(g))
                err = 0.0
            else:
                err = float(
                    np.abs(np.asarray(g) - ref[1]).max()
                    / (np.abs(ref[1]).max() + 1e-12)
                )
            print(f"{variant} div={div} pick={pick} rec={rec}: {dt*1e3:.2f} ms/step "
                  f"(compile {comp:.0f}s, grad rel-err vs v3b {err:.1e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant} div={div} pick={pick} rec={rec}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    # full train step (with Adam) at the best vt config for the bench view
    tk.PICK_VARIANT, tk.FUSED_TILE_DIV, tk.VT_PICK, tk.RECOMPUTE_MASKS = "vt", 2, "mm", False
    st0 = trainer.state
    fn = jax.jit(trainer.train_step_fn, donate_argnums=(0,))
    st, lv = fn(jax.tree.map(jnp.copy, st0), x, t)
    sync(st)
    st = jax.tree.map(jnp.copy, st0)
    t0 = time.time()
    for _ in range(60):
        st, lv = fn(st, x, t)
    sync(st)
    print(f"vt full train step: {(time.time()-t0)/60*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
