"""Real-TPU correctness + throughput for the binned large-table path.

Usage: python scripts/bench_binned.py [--big-only]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tcnn_tpu.ops.encodings.grid import GridEncoding
from tcnn_tpu.ops.pallas import binned_kernel as bk


def _sync(r):
    # block_until_ready is unreliable over the axon tunnel; a tiny D2H
    # copy of a dependent value forces real completion
    leaf = jax.tree.leaves(r)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, iters=20):
    # amortized: async-dispatch all iters, ONE sync at the end (the tunnel
    # D2H round-trip is ~30 ms - syncing per-iter would swamp the signal)
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0 - 0.03) / iters, r


def check_small():
    enc = GridEncoding(2, n_levels=5, n_features_per_level=2,
                       log2_hashmap_size=14, base_resolution=16,
                       per_level_scale=2.0)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (1024, 2)), jnp.float32)
    split = enc._binned_split()
    y_ref = np.asarray(enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla"))
    t0 = time.perf_counter()
    y_bin = np.asarray(jax.jit(lambda p, xx: bk.grid_encode_split(split, p, xx))(params, x))
    print(f"small fwd compile+run {time.perf_counter()-t0:.1f}s")
    err = np.abs(y_bin - y_ref).max()
    print(f"small fwd max_err={err:.4f} (bf16 tol)")
    assert err < 3e-2, err

    gy = jnp.asarray(rng.normal(size=(1024, enc.n_output_dims)), jnp.float32)
    gfun = jax.jit(jax.grad(lambda p: jnp.sum(bk.grid_encode_split(split, p, x).astype(jnp.float32) * gy)))
    t0 = time.perf_counter()
    g_bin = np.asarray(gfun(params))
    print(f"small bwd compile+run {time.perf_counter()-t0:.1f}s")
    g_ref = np.asarray(jax.grad(lambda p: jnp.sum(
        enc.apply_unpadded(p, x, compute_dtype=jnp.float32, impl="xla").astype(jnp.float32) * gy))(params))
    rel = np.abs(g_bin - g_ref).max() / (np.abs(g_ref).max() + 1e-9)
    print(f"small bwd max_rel_err={rel:.4f}")
    assert rel < 5e-2, rel
    print("SMALL OK")


def bench_big():
    # the reference's README-default shape: L16 F2 T=2^19 base16 scale2 (2D)
    enc = GridEncoding(2, n_levels=16, n_features_per_level=2,
                       log2_hashmap_size=19, base_resolution=16,
                       per_level_scale=2.0)
    split = enc._binned_split()
    assert split is not None
    bp = split.binned
    print(f"big: prefix_levels={split.dense.n_levels if split.dense else 0} "
          f"binned_levels={bp.n_levels} t_rows={bp.t_rows} rb={bp.r_blocks} "
          f"cap={bp.cap} nt={bp.nt} n_params={enc.n_params/1e6:.1f}M")
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1e-4, 1e-4, enc.n_params), jnp.float32)
    B = 1 << 18
    x = jnp.asarray(rng.uniform(0, 1, (B, 2)), jnp.float32)
    gy = jnp.asarray(rng.normal(size=(B, enc.n_output_dims)), jnp.float32) * 1e-3

    fwd = jax.jit(lambda p, xx: bk.grid_encode_split(split, p, xx))
    t0 = time.perf_counter()
    y = fwd(params, x)
    jax.block_until_ready(y)
    print(f"big fwd compile {time.perf_counter()-t0:.1f}s")
    dt, _ = timeit(fwd, params, x)
    print(f"big fwd {dt*1e3:.1f} ms -> {B/dt/1e6:.2f} M samples/s (fwd only)")

    # spot-check correctness vs XLA oracle on a small slice
    xs = x[:512]
    y_ref = np.asarray(enc.apply_unpadded(params, xs, compute_dtype=jnp.float32, impl="xla"))
    err = np.abs(np.asarray(y[:512], np.float32) - y_ref).max()
    print(f"big fwd max_err vs oracle = {err:.2e}")

    vg = jax.jit(jax.grad(lambda p, xx, g: jnp.sum(
        bk.grid_encode_split(split, p, xx).astype(jnp.float32) * g)))
    t0 = time.perf_counter()
    gr = vg(params, x, gy)
    jax.block_until_ready(gr)
    print(f"big fwd+bwd compile {time.perf_counter()-t0:.1f}s")
    dt2, _ = timeit(vg, params, x, gy)
    print(f"big fwd+bwd {dt2*1e3:.1f} ms -> {B/dt2/1e6:.2f} M samples/s")


if __name__ == "__main__":
    if "--big-only" not in sys.argv:
        check_small()
    bench_big()
