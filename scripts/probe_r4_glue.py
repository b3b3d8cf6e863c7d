"""Round-4 glue probe (VERDICT r4 item 1a): where do the ~5-6 ms/step
between the autotune's eager measurement (33.9 ms, BENCH_r03) and the
bench's scan loop (37.6 ms) go?

Measures, at the production knobs (RECOMPUTE_MASKS=False, FUSED_TILE_DIV=4,
PICK_VARIANT=v3b), config_hash b=2^18:

  eager        jit(train_step_fn) no donation, dispatch-pipelined chain
  eager_don    same with donate_argnums=(0,)
  unroll10     jit of 10 python-unrolled steps (fixed batch), donated
  scan10_fixed jit(scan of 10 steps, fixed xy/rgb), donated
  scan10_rng   + per-iter RNG batch (no image sampling)
  scan10_full  the bench's exact loop (RNG + quad sampling), donated
  scan50_full  longer scan (does per-scan overhead amortize?)

Then the inference tile sweep DOWN (the r3 autotune only swept up):
  fused_forward at INFER_TILE in {0(=plan tile), 512, 256} x
  {cwend, v3b, base}.

All timings chained (>=30 dispatches between syncs) with one tiny D2H
copy as the sync; per the round-2 methodology note sub-ms absolute
accuracy is bounded by the ~30 ms tunnel RTT correction, so numbers are
read as per-step means over >=100 steps.
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
from tcnn_tpu.ops.pallas import train_kernel as tk
from tcnn_tpu.utils.image import build_quad_table, load_image, synthetic_image

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
    config = tc.load_config("/root/repo/data/config_hash.json")
    model = tc.create_from_config(2, 3, config)
    trainer = model.trainer
    h, w = image.shape[:2]
    quad = jax.jit(build_quad_table)(jnp.asarray(image))
    from tcnn_tpu.utils.image import sample_image_quad

    xy0 = jax.random.uniform(jax.random.PRNGKey(3), (B, 2))
    rgb0 = sample_image_quad(quad, h, w, xy0)
    key = jax.random.key(1337, impl="rbg")

    def report(name, steps_per_call, fn, *args, iters=None, ret=False):
        iters = iters or max(1, 120 // steps_per_call)
        out = fn(*args)  # compile + settle
        sync(out)
        out = None
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        dt = (time.time() - t0) / (iters * steps_per_call)
        print(f"{name}: {dt*1e3:.2f} ms/step", flush=True)
        return outs[-1] if ret else None

    def report_st(name, steps_per_call, fn, st0, *args, iters=None):
        """donating variants: thread the state through the chain."""
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

    st0 = trainer.state

    # --- eager, no donation (the autotune's measurement) ---
    fn = jax.jit(trainer.train_step_fn)
    report("eager", 1, lambda: fn(st0, xy0, rgb0)[1], iters=60)

    # --- eager with donation ---
    fn_d = jax.jit(trainer.train_step_fn, donate_argnums=(0,))
    report_st("eager_don", 1,
              lambda s: fn_d(s, xy0, rgb0)[0], st0, iters=120)

    # --- 10 python-unrolled steps in one jit ---
    def unroll10(st):
        for _ in range(10):
            st, loss = trainer.train_step_fn(st, xy0, rgb0)
        return st
    report_st("unroll10", 10, jax.jit(unroll10, donate_argnums=(0,)), st0)

    # --- scan of 10, fixed batch ---
    def scan10_fixed(st):
        def body(c, _):
            c, loss = trainer.train_step_fn(c, xy0, rgb0)
            return c, loss
        st, _ = jax.lax.scan(body, st, None, length=10)
        return st
    report_st("scan10_fixed", 10,
              jax.jit(scan10_fixed, donate_argnums=(0,)), st0)

    # --- scan of 10, per-iter RNG batch (no image sampling) ---
    def scan10_rng(st, k):
        def body(carry, _):
            c, k0 = carry
            k0, kk = jax.random.split(k0)
            xy = jax.random.uniform(kk, (B, 2))
            c, loss = trainer.train_step_fn(c, xy, rgb0)
            return (c, k0), loss
        (st, k), _ = jax.lax.scan(body, (st, k), None, length=10)
        return st
    report_st("scan10_rng", 10,
              jax.jit(scan10_rng, donate_argnums=(0,)), st0, key)

    # --- the bench's exact loop ---
    def scan_full(st, k, quad_arg, n):
        def body(carry, _):
            c, k0 = carry
            k0, kk = jax.random.split(k0)
            xy = jax.random.uniform(kk, (B, 2))
            rgb = sample_image_quad(quad_arg, h, w, xy)
            c, loss = trainer.train_step_fn(c, xy, rgb)
            return (c, k0), loss
        (st, k), _ = jax.lax.scan(body, (st, k), None, length=n)
        return st
    import functools
    report_st("scan10_full", 10,
              jax.jit(functools.partial(scan_full, n=10),
                      donate_argnums=(0,)), st0, key, quad)
    report_st("scan50_full", 50,
              jax.jit(functools.partial(scan_full, n=50),
                      donate_argnums=(0,)), st0, key, quad)

    # --- inference tile sweep DOWN -------------------------------------
    print("# inference fused_forward sweep", flush=True)
    params = trainer.inference_params
    xy_inf = xy0
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
                out = f(params, xy_inf)
                sync(out)
                t0 = time.time()
                for _ in range(40):
                    out = f(params, xy_inf)
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
