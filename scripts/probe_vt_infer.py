"""vt forward-only kernel: tile/variant sweep on the real chip."""
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


def main():
    tm = tc.create_from_config(
        2, 3, tc.load_config("/root/repo/data/config_hash.json")
    )
    model, trainer = tm.network, tm.trainer
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    params = trainer.inference_params
    ref = None
    for variant in ("vt",):
        for tile in (512, 1024, 2048, 0):
            tk.INFER_VARIANT, tk.INFER_TILE = variant, tile
            try:
                f = jax.jit(
                    lambda p, i: tk.fused_forward(model, p, i)[
                        :, : model.n_output_dims
                    ].astype(jnp.float32)
                )
                out = f(params, x)
                np.asarray(out[:1, :1])
                if ref is None:
                    ref = np.asarray(out)
                err = float(np.abs(np.asarray(out) - ref).max())
                t0 = time.time()
                for _ in range(40):
                    out = f(params, x)
                np.asarray(out[:1, :1])
                dt = (time.time() - t0) / 40
                print(f"inf {variant} tile={tile or 'plan'}: {dt*1e3:.2f} ms"
                      f" = {B/dt/1e6:.2f} M/s (max diff {err:.1e})",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"inf {variant} tile={tile}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    tk.INFER_VARIANT, tk.INFER_TILE = "", 0


if __name__ == "__main__":
    main()
