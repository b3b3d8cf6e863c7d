"""Round-4 probe #3: u32-packed quad sampling (3 gathered elements/row
instead of 12) standalone and inside the bench scan loop. Also re-times
the full bench loop at the new inference winner (tile 512)."""
import functools
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
from tcnn_tpu.utils.image import (
    build_quad_table_packed,
    load_image,
    sample_image_quad_packed,
    synthetic_image,
)

B = 1 << int(os.environ.get("TCNN_LOG2_B", "18"))
REFERENCE_IMAGE = "/root/reference/data/images/albert.jpg"

tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT = False, 4, "v3b"


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[:1]


def main():
    image = (
        load_image(REFERENCE_IMAGE)
        if os.path.exists(REFERENCE_IMAGE)
        else synthetic_image(1024, 1024)
    )
    tm = tc.create_from_config(2, 3, tc.load_config("/root/repo/data/config_hash.json"))
    model, trainer = tm.network, tm.trainer
    h, w = image.shape[:2]
    packed = jax.jit(build_quad_table_packed)(jnp.asarray(image))

    xy0 = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    key = jax.random.key(1337, impl="rbg")
    st0 = trainer.state

    samp = jax.jit(lambda q, xy: sample_image_quad_packed(q, h, w, xy))
    out = samp(packed, xy0)
    sync(out)
    t0 = time.time()
    for _ in range(60):
        out = samp(packed, xy0)
    sync(out)
    print(f"sample_packed_alone: {(time.time()-t0)/60*1e3:.2f} ms", flush=True)

    def scan_full(st, k, q, n):
        def body(carry, _):
            c, k0 = carry
            k0, kk = jax.random.split(k0)
            xy = jax.random.uniform(kk, (B, 2))
            rgb = sample_image_quad_packed(q, h, w, xy)
            c, loss = trainer.train_step_fn(c, xy, rgb)
            return (c, k0), loss
        (st, k), _ = jax.lax.scan(body, (st, k), None, length=n)
        return st

    fn = jax.jit(functools.partial(scan_full, n=10), donate_argnums=(0,))
    st = fn(jax.tree.map(jnp.copy, st0), key, packed)
    sync(st)
    st = jax.tree.map(jnp.copy, st0)
    t0 = time.time()
    for _ in range(12):
        st = fn(st, key, packed)
    sync(st)
    print(f"scan10_full_packed: {(time.time()-t0)/120*1e3:.2f} ms/step"
          f" = {B*120/(time.time()-t0)/1e6:.2f} M samples/s", flush=True)

    # inference at the new winner for the record
    tk.INFER_TILE, tk.INFER_VARIANT = 512, "v3b"
    f = jax.jit(
        lambda p, i: tk.fused_forward(model, p, i)[
            :, : model.n_output_dims
        ].astype(jnp.float32)
    )
    params = trainer.inference_params
    out = f(params, xy0)
    sync(out)
    t0 = time.time()
    for _ in range(60):
        out = f(params, xy0)
    sync(out)
    dt = (time.time() - t0) / 60
    print(f"inf v3b tile=512: {dt*1e3:.2f} ms = {B/dt/1e6:.2f} M/s", flush=True)


if __name__ == "__main__":
    main()
