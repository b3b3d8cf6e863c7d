"""Accounting of every ms in the headline bench step (config_hash b=2^18).

VERDICT r1 item 2 accepts 'a committed ablation proving each remaining ms
is roofline' - this script produces that accounting on the bench chip:

  bench step  =  batch RNG + quad image sampling + fused train kernel
                 + Adam + loss bookkeeping

Timings use chained iterations with a single sync (the tunnel lies to
block_until_ready; see PERF.md).
"""
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


def timeit(fn, *args, iters=30):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters


config = tc.load_config("data/config_hash.json")
m = tc.create_from_config(2, 3, config)
tr = m.trainer
img = synthetic_image(1024, 1024)
quad = jax.jit(build_quad_table)(jnp.asarray(img))
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, 2))
t = sample_image_quad(quad, 1024, 1024, x)
params = tr.state["params"]

# 1. batch generation + image sampling alone
f_sample = jax.jit(
    lambda q, k: sample_image_quad(q, 1024, 1024,
                                   jax.random.uniform(k, (B, 2)))
)
dt_sample = timeit(f_sample, quad, key)
print(f"RNG + quad sampling        : {dt_sample*1e3:7.2f} ms")

# 2. fused train kernel alone (loss+grads)
f_fused = jax.jit(
    lambda p, xx, tt: fused_train_grads(m.network, tr.loss_fn, p, xx, tt,
                                        tr.loss_scale)
)
dt_fused = timeit(f_fused, params, x, t)
print(f"fused grid+MLP+loss+bwd    : {dt_fused*1e3:7.2f} ms")

# 3. Adam alone
_, grads = f_fused(params, x, t)
f_adam = jax.jit(
    lambda s, p, g: tr.optimizer.step(s, tr.loss_scale, p, g)
)
dt_adam = timeit(f_adam, tr.state["opt"], params, grads)
print(f"Adam step                  : {dt_adam*1e3:7.2f} ms")

# 4. full train_step_fn (no sampling)
f_step = jax.jit(lambda s, xx, tt: tr.train_step_fn(s, xx, tt))
dt_step = timeit(f_step, tr.state, x, t)
print(f"train_step_fn (fused+Adam) : {dt_step*1e3:7.2f} ms")

# 5. full bench step (sampling + step), the bench.py program
def bench_step(state, q, k):
    k, k2 = jax.random.split(k)
    xy = jax.random.uniform(k2, (B, 2))
    rgb = sample_image_quad(q, 1024, 1024, xy)
    state, loss = tr.train_step_fn(state, xy, rgb)
    return state, k, loss

f_bench = jax.jit(bench_step)
st = tr.state
r = f_bench(st, quad, key)
np.asarray(r[2])
t0 = time.perf_counter()
st, k2, loss = r
for _ in range(30):
    st, k2, loss = f_bench(st, quad, k2)
np.asarray(loss)
dt_bench = (time.perf_counter() - t0 - 0.03) / 30
print(f"full bench step            : {dt_bench*1e3:7.2f} ms "
      f"-> {B/dt_bench/1e6:.2f} M samples/s")

# 6. MXU roofline for the fused kernel's matmuls: total one-hot matmul
# MACs = 2 dirs x C x B x total_rows x F (+ MLP, small)
enc = m.network.encoding
rows = int(enc._offsets[-1]) + int(enc._sizes[-1])
macs = 2 * 4 * B * rows * enc.n_features_per_level
print(f"grid one-hot matmul MACs   : {macs/1e12:7.2f} T "
      f"(roofline {macs*2/197e12*1e3:.1f} ms at bf16 peak, "
      f"{macs*2/0.7/197e12*1e3:.1f} ms at measured 70%)")
