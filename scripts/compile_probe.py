"""Compile-time probe for the grid kernels (round-3 debugging).

Times jit-compile + first-run of individual kernels at a small batch on
the real TPU. Usage: python -u scripts/compile_probe.py fwd|bwd|fused|infer
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

B = 1 << 12


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    config = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    enc = m.network.encoding
    tr = m.trainer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    params = tr.state["params"]
    enc_p = params[m.network.network.n_params :]

    t0 = time.perf_counter()
    if which == "fwd":
        f = jax.jit(lambda p, xx: enc.apply(p, xx, needs_input_grad=False))
        r = f(enc_p, x)
    elif which == "bwd":
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
        r = f(enc_p, x)
    elif which == "fused":
        from tcnn_tpu.ops.pallas.train_kernel import fused_train_grads

        f = jax.jit(
            lambda p, xx, tt: fused_train_grads(
                m.network, tr.loss_fn, p, xx, tt, tr.loss_scale
            )
        )
        r = f(params, x, t)
    elif which == "infer":
        from tcnn_tpu.ops.pallas.train_kernel import fused_forward

        f = jax.jit(lambda p, xx: fused_forward(m.network, p, xx))
        r = f(params, x)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    print(f"{which}: compile+run {time.perf_counter()-t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
