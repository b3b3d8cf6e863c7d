"""Per-stage compile + runtime breakdown of the binned path (big config)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tcnn_tpu.ops.encodings.grid import GridEncoding
from tcnn_tpu.ops.pallas import binned_kernel as bk
from tcnn_tpu.ops.pallas import grid_kernel as gk


def _sync(r):
    leaf = jax.tree.leaves(r)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    r = fn(*args)
    _sync(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _sync(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} compile {compile_s:7.1f}s   run {dt*1e3:8.2f} ms", flush=True)
    return r


enc = GridEncoding(2, n_levels=16, n_features_per_level=2,
                   log2_hashmap_size=19, base_resolution=16,
                   per_level_scale=2.0)
split = enc._binned_split()
bp = split.binned
rng = np.random.default_rng(0)
params = jnp.asarray(rng.uniform(-1e-4, 1e-4, enc.n_params), jnp.float32)
B = 1 << 18
x = jnp.asarray(rng.uniform(0, 1, (B, 2)), jnp.float32)
gy = jnp.asarray(rng.normal(size=(B, enc.n_output_dims)), jnp.float32)
p_suf = params[split.n_prefix_params:]

tp = timed("repack", jax.jit(lambda p: gk.repack_table(bp.sub, p)), p_suf)
sh, sl, ranks = timed("A bin", jax.jit(lambda xx: bk._bin_call(bp, xx)), x)
feats = timed("B gather", jax.jit(lambda a, b, t: bk._gather_call(bp, a, b, t)), sh, sl, tp)
y = timed("C combine", jax.jit(lambda xx, r, f: bk._combine_call(bp, xx, r, f)), x, ranks, feats)
gyb = gy[:, split.dense.n_levels * 2:]
sv = timed("P place", jax.jit(lambda xx, r, g: bk._place_call(bp, xx, r, g)), x, ranks, gyb)
gt = timed("B' scatter", jax.jit(lambda a, b, v: bk._scatter_call(bp, a, b, v)), sh, sl, sv)
gu = timed("unpack", jax.jit(lambda g: gk.unpack_table_grads(bp.sub, g, int(p_suf.shape[0]))), gt)

# dense prefix for comparison
pd = params[: split.n_prefix_params]
yd = timed("dense prefix fwd", jax.jit(
    lambda p, xx: gk.grid_encode_pallas(split.dense, p, xx)), pd, x)

# XLA glue costs
timed("swap sh", jax.jit(lambda a: jnp.swapaxes(a, 0, 1) + 0), sh)
timed("swap feats", jax.jit(lambda a: jnp.swapaxes(a, 0, 1).astype(jnp.bfloat16)), feats)
timed("swap sv", jax.jit(lambda a: jnp.swapaxes(a, 0, 1) + 0), sv)
print("shapes:", sh.shape, feats.shape, sv.shape, gt.shape)
