"""Verify microbench: dependency-chained timing + size scaling sanity."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x0, n=50):
    """fn must map x -> x-like; chains outputs so calls can't overlap."""
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    for NG in (1 << 22, 1 << 24):
        S = 350_000
        table = jnp.asarray(rng.normal(size=(S, 2)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, NG), jnp.int32)

        # gather chained: out feeds a cheap reduce that perturbs the index
        @jax.jit
        def g(i, table=table, S=S):
            v = table[i]  # [NG, 2]
            return (i + v[:, 0].astype(jnp.int32)) % S

        dt = chain_time(g, idx)
        print(f"NG=2^{int(np.log2(NG))} gather_chained: {dt*1e3:.3f} ms "
              f"-> {NG/dt/1e9:.1f} G rows/s")

        vals = jnp.asarray(rng.normal(size=(NG, 2)), jnp.float32)

        @jax.jit
        def sc(v, idx=idx, S=S):
            t = jnp.zeros((S, 2), jnp.float32).at[idx].add(v)
            return v + t[:1]  # dependency

        dt = chain_time(sc, vals, n=10)
        print(f"NG=2^{int(np.log2(NG))} scatter_chained: {dt*1e3:.3f} ms "
              f"-> {NG/dt/1e9:.1f} G upd/s")


if __name__ == "__main__":
    main()
