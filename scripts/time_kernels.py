"""Time individual Pallas kernels at the bench shape (config_hash b=2^18).

Usage: python -u scripts/time_kernels.py [fwd bwd fused infer step ...]
Chained-iteration timing (the tunnel lies to block_until_ready).
"""
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

B = 1 << 18


def timeit(fn, *args, iters=40):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters


def main():
    which = sys.argv[1:] or ["fwd", "bwd", "fused", "infer"]
    config = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    enc = m.network.encoding
    tr = m.trainer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    params = tr.state["params"]
    enc_p = params[m.network.network.n_params :]

    for w in which:
        if w == "fwd":
            f = jax.jit(
                lambda p, xx: enc.apply(p, xx, needs_input_grad=False)
            )
            dt = timeit(f, enc_p, x)
        elif w == "bwd":
            f = jax.jit(
                jax.grad(
                    lambda p, xx: jnp.sum(
                        enc.apply(p, xx, needs_input_grad=False).astype(
                            jnp.float32
                        )
                        ** 2
                    )
                )
            )
            dt = timeit(f, enc_p, x)
        elif w == "fused":
            from tcnn_tpu.ops.pallas.train_kernel import fused_train_grads

            f = jax.jit(
                lambda p, xx, tt: fused_train_grads(
                    m.network, tr.loss_fn, p, xx, tt, tr.loss_scale
                )
            )
            dt = timeit(f, params, x, t)
        elif w == "infer":
            from tcnn_tpu.ops.pallas.train_kernel import fused_forward

            f = jax.jit(lambda p, xx: fused_forward(m.network, p, xx))
            dt = timeit(f, params, x)
        elif w == "infer_composed":
            f = jax.jit(lambda xx: tr.inference(xx))
            dt = timeit(f, x)
        elif w == "step":
            f = jax.jit(lambda s, xx, tt: tr.train_step_fn(s, xx, tt))
            dt = timeit(f, tr.state, x, t)
        print(f"{w}: {dt*1e3:.2f} ms = {B/dt/1e6:.2f} M samples/s",
              flush=True)


if __name__ == "__main__":
    main()
