"""Round-4 glue probe #2: the first probe pinned the bench-loop deficit on
`sample_image_quad` INSIDE the scan body (+6.4 ms/step vs its 1.17 ms
standalone cost; RNG/scan/donation all within noise). Localize it:

  sample_scan10    scan of (RNG + sampling) ONLY - is the gather itself
                   slow inside a scan program, or only next to the kernel?
  step_sample_eager jit(sample + train step) ONE call - fusion-with-kernel
                   vs scan?
  hoist10          all 10 batches sampled BEFORE the scan (one [10B] RNG +
                   one [10B] gather), scan consumes xs slices
  hoist10_bf16     same with a bf16 quad table (half the gather bytes)
  sample_alone     standalone jit(sample) re-measurement for the record

Then the fused inference sweep the first probe fumbled (model.network, not
the TrainableModel wrapper).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
from tcnn_tpu.ops.pallas import train_kernel as tk
from tcnn_tpu.utils.image import (
    build_quad_table,
    load_image,
    sample_image_quad,
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
    quad = jax.jit(build_quad_table)(jnp.asarray(image))
    quad16 = quad.astype(jnp.bfloat16)

    xy0 = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    key = jax.random.key(1337, impl="rbg")
    st0 = trainer.state

    def report(name, steps_per_call, fn, *args, iters=None):
        iters = iters or max(1, 120 // steps_per_call)
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / (iters * steps_per_call)
        print(f"{name}: {dt*1e3:.2f} ms/step", flush=True)

    def report_st(name, steps_per_call, fn, st0, *args, iters=None):
        iters = iters or max(1, 120 // steps_per_call)
        st = fn(jax.tree.map(jnp.copy, st0), *args)
        sync(st)
        st = jax.tree.map(jnp.copy, st0)
        t0 = time.time()
        for _ in range(iters):
            st = fn(st, *args)
        sync(st)
        dt = (time.time() - t0) / (iters * steps_per_call)
        print(f"{name}: {dt*1e3:.2f} ms/step", flush=True)

    # --- standalone sampling, for the record --------------------------------
    samp = jax.jit(lambda q, xy: sample_image_quad(q, h, w, xy))
    report("sample_alone", 1, samp, quad, xy0, iters=60)

    # --- scan of RNG + sampling only ----------------------------------------
    def sample_scan(k, q, n):
        def body(k0, _):
            k0, kk = jax.random.split(k0)
            xy = jax.random.uniform(kk, (B, 2))
            rgb = sample_image_quad(q, h, w, xy)
            return k0, rgb[0, 0]
        k, outs = jax.lax.scan(body, k, None, length=n)
        return outs
    report("sample_scan10", 10,
           jax.jit(functools.partial(sample_scan, n=10)), key, quad)

    # --- one eager call: sampling fused with the train step -----------------
    def step_sample(st, k, q):
        k, kk = jax.random.split(k)
        xy = jax.random.uniform(kk, (B, 2))
        rgb = sample_image_quad(q, h, w, xy)
        st, loss = trainer.train_step_fn(st, xy, rgb)
        return st
    report_st("step_sample_eager", 1,
              jax.jit(step_sample, donate_argnums=(0,)), st0, key, quad,
              iters=60)

    # --- hoisted batch generation -------------------------------------------
    def hoist(st, k, q, n, cast=None):
        k, kk = jax.random.split(k)
        xy_all = jax.random.uniform(kk, (n * B, 2))
        rgb_all = sample_image_quad(q, h, w, xy_all)
        if cast is not None:
            rgb_all = rgb_all.astype(cast)
        xy_all = xy_all.reshape(n, B, 2)
        rgb_all = rgb_all.reshape(n, B, -1).astype(jnp.float32)

        def body(c, xt):
            xy, rgb = xt
            c, loss = trainer.train_step_fn(c, xy, rgb)
            return c, loss
        st, _ = jax.lax.scan(body, st, (xy_all, rgb_all))
        return st
    report_st("hoist10", 10,
              jax.jit(functools.partial(hoist, n=10), donate_argnums=(0,)),
              st0, key, quad)
    report_st("hoist10_bf16", 10,
              jax.jit(functools.partial(hoist, n=10), donate_argnums=(0,)),
              st0, key, quad16)

    # --- fused inference sweep (fixed) ---------------------------------------
    print("# inference fused_forward sweep", flush=True)
    params = trainer.inference_params
    for variant in ("cwend", "v3b", "base"):
        for tile in (0, 512, 256):
            tk.PICK_VARIANT = variant
            tk.INFER_TILE = tile
            try:
                f = jax.jit(
                    lambda p, i: tk.fused_forward(model, p, i)[
                        :, : model.n_output_dims
                    ].astype(jnp.float32)
                )
                out = f(params, xy0)
                sync(out)
                t0 = time.time()
                for _ in range(40):
                    out = f(params, xy0)
                sync(out)
                dt = (time.time() - t0) / 40
                print(f"inf {variant} tile={tile or 'plan'}: {dt*1e3:.2f} ms"
                      f" = {B/dt/1e6:.2f} M/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"inf {variant} tile={tile}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    tk.PICK_VARIANT, tk.INFER_TILE = "v3b", 0


if __name__ == "__main__":
    main()
