"""Round-3 headline probes: where do the non-kernel ms of the bench step go,
and is there tile/scheduling headroom left in the fused kernel?

Targets (VERDICT r2 item 1): bench 6.45 M -> >= 9 M samples/s on config_hash
b=2^18. Accounting so far (ablate_step_phases.py, round 2): fused kernel
~34 ms of a ~40.6 ms bench step; sampling 1.6; Adam 0.3. This script probes
the unaccounted ~4-5 ms (batch RNG? dispatch? loss tail?) plus re-tunes
the fused tile now that the round-3 kernel changed.

Run on the bench chip: python scripts/probe_r3_headline.py
"""
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from tcnn_tpu.ops.pallas.train_kernel import fused_train_grads
from tcnn_tpu.utils.image import build_quad_table, sample_image_quad, synthetic_image

B = 1 << 18


def _sync(r):
    """D2H-copy one scalar of r (PRNGKey leaves aren't numpy-convertible).

    Assumes r's leaves come from ONE jit dispatch (single executable): the
    copy waits for that whole executable, so syncing the first numeric
    leaf suffices. For results assembled from separate dispatches, call
    jax.block_until_ready(r) first (advisor r3 finding). The fallback
    assumes leaves[0] is a typed PRNG key."""
    for leaf in jax.tree.leaves(r):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            return np.asarray(leaf.reshape(-1)[:1])
    return np.asarray(
        jax.random.key_data(jax.tree.leaves(r)[0]).reshape(-1)[:1]
    )


def timeit(fn, *args, iters=30):
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0 - 0.03) / iters


config = tc.load_config("data/config_hash.json")
m = tc.create_from_config(2, 3, config)
tr = m.trainer
img = synthetic_image(1024, 1024)
quad = jax.jit(build_quad_table)(jnp.asarray(img))
key_tf = jax.random.PRNGKey(0)
key_rbg = jax.random.key(0, impl="rbg")
x = jax.random.uniform(key_tf, (B, 2))
t = sample_image_quad(quad, 1024, 1024, x)
params = tr.state["params"]

# ---- A. batch RNG cost: threefry vs rbg (split + uniform, the bench's
# per-step generation work) --------------------------------------------------
for name, k in (("threefry", key_tf), ("rbg", key_rbg)):
    def gen(kk):
        kk, k2 = jax.random.split(kk)
        return kk, jax.random.uniform(k2, (B, 2))

    f = jax.jit(gen)
    dt = timeit(f, k)
    print(f"A. split+uniform 2^18x2 [{name:8s}]: {dt*1e3:7.2f} ms")

# ---- B. sampling alone ------------------------------------------------------
f_sample = jax.jit(lambda q, xx: sample_image_quad(q, 1024, 1024, xx))
print(f"B. quad sampling (given xy)        : {timeit(f_sample, quad, x)*1e3:7.2f} ms")

# ---- C. fused kernel (tile, recompute-masks) sweep -------------------------
# recompute=True rebuilds the one-hot masks in the scatter instead of caching
# them across the MLP - ~14 MB less VMEM at nt=256, so bigger tiles fit.
from tcnn_tpu.ops.pallas import train_kernel as tk

plan0 = m.network.encoding._kernel_plan()
best = (1e9, False, 4, "base")
# stage 1: (recompute, tile) sweep at base; stage 2: pick variants at the
# best schedule (full cross product would be 24 compiles)
for recompute in (False, True):
    for div in (8, 4, 2, 1):  # nt = 1024 // div
        tk.RECOMPUTE_MASKS = recompute
        tk.FUSED_TILE_DIV = div
        try:
            f_fused = jax.jit(
                lambda p, xx, tt: fused_train_grads(
                    m.network, tr.loss_fn, p, xx, tt, tr.loss_scale
                )
            )
            dt = timeit(f_fused, params, x, t)
            print(f"C. fused nt={1024//div:4d} recompute={int(recompute)}"
                  f"   : {dt*1e3:7.2f} ms")
            best = min(best, (dt, recompute, div, "base"))
        except Exception as e:  # noqa: BLE001 - OOM tiles report and continue
            print(f"C. fused nt={1024//div:4d} recompute={int(recompute)}"
                  f"   : FAILED {type(e).__name__}")
if best[0] < 1e8:
    tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV = best[1], best[2]
    for variant in ("cwend", "v3b"):
        tk.PICK_VARIANT = variant
        try:
            f_fused = jax.jit(
                lambda p, xx, tt: fused_train_grads(
                    m.network, tr.loss_fn, p, xx, tt, tr.loss_scale
                )
            )
            dt = timeit(f_fused, params, x, t)
            print(f"C. fused pick={variant:5s} (best sched) : {dt*1e3:7.2f} ms")
            best = min(best, (dt, best[1], best[2], variant))
        except Exception as e:  # noqa: BLE001
            print(f"C. fused pick={variant:5s} (best sched) : FAILED "
                  f"{type(e).__name__}")
# section D runs the full bench step with the best fused config from C
if best[0] < 1e8:
    tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT = (
        best[1], best[2], best[3],
    )
    print(f"   -> best: recompute={int(best[1])} div={best[2]} "
          f"pick={best[3]} ({best[0]*1e3:.2f} ms)")
else:
    tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT = False, 4, "base"
    print("   -> sweep produced NO valid config; D uses defaults")
print()

# ---- D. full bench step: threefry vs rbg, scan 10 vs 20 ---------------------
def make_bench(scan_steps):
    def multi(state, kk, q):
        def step(carry, _):
            st, k0 = carry
            k0, k2 = jax.random.split(k0)
            xy = jax.random.uniform(k2, (B, 2))
            rgb = sample_image_quad(q, 1024, 1024, xy)
            st, loss = tr.train_step_fn(st, xy, rgb)
            return (st, k0), loss

        (state, kk), losses = jax.lax.scan(step, (state, kk), None,
                                           length=scan_steps)
        return state, kk, losses[-1]

    return jax.jit(multi, donate_argnums=(0,))


# ---- C2. fused-inference tile sweep (no scatter -> VMEM-light; the
# composed path pipelines at nt=1024, maybe bigger is better here) ---------
from tcnn_tpu.ops.pallas.train_kernel import fused_forward

best_sched = (tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT)
for variant in dict.fromkeys(("base", "cwend", "v3b")):
    tk.PICK_VARIANT = variant
    for tile in (1024, 2048, 4096):
        plan_t = dataclasses.replace(plan0, batch_tile=tile)
        m.network.encoding._kernel_plan = lambda p=plan_t: p  # type: ignore
        try:
            f_inf = jax.jit(lambda p, xx: fused_forward(m.network, p, xx))
            dt = timeit(f_inf, params, x)
            print(f"C2. fused inference nt={tile:5d} pick={variant:5s}: "
                  f"{dt*1e3:7.2f} ms -> {B/dt/1e6:.2f} M samples/s")
        except Exception as e:  # noqa: BLE001
            print(f"C2. fused inference nt={tile:5d} pick={variant:5s}: "
                  f"FAILED {type(e).__name__}")
        finally:
            del m.network.encoding._kernel_plan
tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT = best_sched
print()

for name, k in (("threefry", key_tf), ("rbg", key_rbg)):
    for scan_steps in (10, 20):
        f = make_bench(scan_steps)
        st = jax.tree.map(jnp.copy, tr.state)
        st, kk, loss = f(st, k, quad)
        np.asarray(loss)
        t0 = time.perf_counter()
        for _ in range(60 // scan_steps):
            st, kk, loss = f(st, kk, quad)
        np.asarray(loss)
        dt = (time.perf_counter() - t0 - 0.03) / 60
        print(f"D. bench step [{name:8s} scan={scan_steps:2d}]   : "
              f"{dt*1e3:7.2f} ms -> {B/dt/1e6:.2f} M samples/s")
