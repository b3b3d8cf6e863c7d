"""VT_LOMASK probe: the vt lane-mask build as one all-levels expansion
matmul ("mm", the [128L, C*nt] resident that caps the train tile at 512)
vs per-level transient builds ("bcast", rebuilt in the scatter loop).
Times the fused train kernel over (lomask, div) and the forward-only
kernel over (lomask, tile) at config_hash b=2^18; checks grad parity
(the masks are exact integer compares either way -> bit-identical)."""
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

    ref = None
    for lomask, div in (("mm", 2), ("bcast", 2), ("bcast", 1), ("bcast", 4)):
        tk.VT_LOMASK, tk.FUSED_TILE_DIV = lomask, div
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
            print(f"train lomask={lomask} div={div}: {dt*1e3:.2f} ms/step "
                  f"(compile {comp:.0f}s, grad max-abs vs mm {err:.1e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train lomask={lomask} div={div}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    prepared = tk.prepare_forward(model, p)
    yref = None
    for lomask, tile in (("mm", 1024), ("bcast", 1024), ("bcast", 2048)):
        tk.VT_LOMASK, tk.INFER_TILE = lomask, tile
        f = jax.jit(
            lambda xx: tk.fused_forward_prepared(model, prepared, xx)
        )
        try:
            t0 = time.time()
            y = f(x)
            sync(y)
            comp = time.time() - t0
            t0 = time.time()
            for _ in range(30):
                y = f(x)
            sync(y)
            dt = (time.time() - t0) / 30
            ya = np.asarray(y, np.float32)
            if yref is None:
                yref = ya
                err = 0.0
            else:
                err = float(np.abs(ya - yref).max())
            print(f"infer lomask={lomask} tile={tile}: {dt*1e3:.2f} ms "
                  f"= {B/dt/1e6:.1f} M/s (compile {comp:.0f}s, "
                  f"max-abs vs first {err:.1e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"infer lomask={lomask} tile={tile}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    tk.INFER_TILE = 0


if __name__ == "__main__":
    main()
