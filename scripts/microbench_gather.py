"""Microbenchmark: candidate gather/scatter primitives for the hash-grid
hot path on the real TPU. Decides the grid kernel strategy.

Workload shape (config_hash, batch 2^18): per step the grid encoding needs
  fwd: 16.7M random gathers of F=2 features from ~350k rows
  bwd: 16.7M random scatter-adds into the same table
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 18
L = 16
C = 4  # corners (2D)
S_TOTAL = 350_000
NGATHER = B * L * C


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(S_TOTAL, 2)), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S_TOTAL, NGATHER), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(NGATHER, 2)), jnp.float32)

    # 1. XLA gather (table[idx])
    f = jax.jit(lambda t, i: t[i])
    dt = timeit(f, table, idx)
    print(f"xla_gather_f32: {dt*1e3:.2f} ms -> {NGATHER/dt/1e6:.0f} M rows/s")
    dt = timeit(f, table_bf, idx)
    print(f"xla_gather_bf16: {dt*1e3:.2f} ms -> {NGATHER/dt/1e6:.0f} M rows/s")

    # 1b. gather + weighted sum (closer to real fwd: 4 corners x weight)
    w = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    idx4 = idx.reshape(B, L, C)

    def fwd(t, i, w):
        g = t[i]  # [B, L, C, 2]
        return jnp.sum(g * w[..., None], axis=2)

    dt = timeit(jax.jit(fwd), table, idx4, w)
    print(f"xla_gather_interp: {dt*1e3:.2f} ms")

    # 2. XLA scatter-add
    f = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(v))
    dt = timeit(f, table, idx, vals, n=5)
    print(f"xla_scatter_add_f32: {dt*1e3:.2f} ms -> {NGATHER/dt/1e6:.0f} M upd/s")

    # 3. sort + segment_sum scatter
    def scatter_sorted(i, v):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(v[order], i[order], num_segments=S_TOTAL)

    dt = timeit(jax.jit(scatter_sorted), idx, vals, n=5)
    print(f"sort_segment_sum: {dt*1e3:.2f} ms")

    # 3b. segment_sum on pre-sorted indices (sort cost isolated)
    idx_sorted = jnp.sort(idx)
    f = jax.jit(
        lambda i, v: jax.ops.segment_sum(
            v, i, num_segments=S_TOTAL, indices_are_sorted=True
        )
    )
    dt = timeit(f, idx_sorted, vals, n=5)
    print(f"segment_sum_presorted: {dt*1e3:.2f} ms")
    f = jax.jit(lambda i: jnp.sort(i))
    dt = timeit(f, idx, n=5)
    print(f"sort_only_i32: {dt*1e3:.2f} ms")

    # 4. one-hot matmul (current pallas approach, XLA version, ONE level 2^15)
    S1 = 1 << 15
    idx1 = jnp.asarray(rng.integers(0, S1, (B,)), jnp.int32)
    t1 = jnp.asarray(rng.normal(size=(S1 // 128, 128)), jnp.bfloat16)

    def onehot_gather(t, i):
        hi = i >> 7
        oh = (hi[:, None] == jnp.arange(S1 // 128)[None, :]).astype(jnp.bfloat16)
        g = jnp.dot(oh, t, preferred_element_type=jnp.float32)
        return jnp.take_along_axis(g, (i & 127)[:, None], axis=1)

    dt = timeit(jax.jit(onehot_gather), t1, idx1)
    print(
        f"onehot_matmul_1level_1corner: {dt*1e3:.2f} ms "
        f"(x{L*C*2} for full fwd = {dt*1e3*L*C*2:.1f} ms)"
    )


if __name__ == "__main__":
    main()
