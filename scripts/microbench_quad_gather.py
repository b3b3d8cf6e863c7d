"""Microbenchmark: the image-target gather (bench sampling hot op).

Shape: 2^18 random rows from a [2^20, k] table (the packed quad table is
k=3 u32; the fp32 quad is k=12). Questions:
  - per-row vs per-element cost at this table size
  - does index ORDER (locality) matter for XLA's TPU gather?
  - flat 1-el gathers vs one k-el row gather
  - does gather count amortize (2^18 vs 2^21 indices)?
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 18
N_ROWS = 1 << 20


def timeit(fn, *args, n=40):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[:1]
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_ROWS, B), jnp.int32)
    idx_sorted = jnp.sort(idx)
    gather = jax.jit(lambda t, i: t[i])

    for k in (1, 3, 12):
        table = jnp.asarray(
            rng.integers(0, 2**31, (N_ROWS, k)), jnp.uint32
        ) if k > 1 else jnp.asarray(
            rng.integers(0, 2**31, (N_ROWS,)), jnp.uint32
        )
        dt = timeit(gather, table, idx)
        print(f"gather[{N_ROWS}x{k}] random: {dt*1e3:.2f} ms "
              f"({B/dt/1e6:.0f} M rows/s)", flush=True)
        dt = timeit(gather, table, idx_sorted)
        print(f"gather[{N_ROWS}x{k}] sorted: {dt*1e3:.2f} ms "
              f"({B/dt/1e6:.0f} M rows/s)", flush=True)

    # 3 flat single-element gathers instead of one 3-wide row gather
    flat = jnp.asarray(rng.integers(0, 2**31, (N_ROWS * 3,)), jnp.uint32)

    def flat3(t, i):
        return t[i * 3], t[i * 3 + 1], t[i * 3 + 2]

    dt = timeit(jax.jit(flat3), flat, idx)
    print(f"gather flat 3x1el random: {dt*1e3:.2f} ms", flush=True)
    dt = timeit(jax.jit(flat3), flat, idx_sorted)
    print(f"gather flat 3x1el sorted: {dt*1e3:.2f} ms", flush=True)

    # amortization: 8x the indices in one gather
    idx8 = jnp.asarray(rng.integers(0, N_ROWS, 8 * B), jnp.int32)
    table3 = jnp.asarray(rng.integers(0, 2**31, (N_ROWS, 3)), jnp.uint32)
    dt = timeit(gather, table3, idx8, n=10)
    print(f"gather[{N_ROWS}x3] 8x indices: {dt*1e3:.2f} ms "
          f"({8*B/dt/1e6:.0f} M rows/s)", flush=True)

    # small-table control (the round-1 microbench regime)
    small = jnp.asarray(rng.integers(0, 2**31, (350_000, 2)), jnp.uint32)
    idx_s = jnp.asarray(rng.integers(0, 350_000, B), jnp.int32)
    dt = timeit(gather, small, idx_s)
    print(f"gather[350000x2] random: {dt*1e3:.2f} ms "
          f"({B/dt/1e6:.0f} M rows/s)", flush=True)

    # sorted-uniform generation cost (cumsum-of-exponentials trick)
    def sorted_uniform(key):
        e = -jnp.log1p(-jax.random.uniform(key, (B + 1,)))
        s = jnp.cumsum(e)
        return s[:B] / s[B]

    key = jax.random.key(7, impl="rbg")
    dt = timeit(jax.jit(sorted_uniform), key)
    print(f"sorted_uniform gen (cumsum exp): {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
