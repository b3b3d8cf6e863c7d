"""Round-4 tolerance receipts (VERDICT r3 items 7+8), on the real chip:

1. PPNG3 binned-vs-XLA forward error at production shape (the r3 hw test
   pinned atol=rtol=3e-2, 30x looser than the grid's 1e-3 - measure the
   actual distribution to tighten or justify).
2. ReLU fused-ig vs composed-ig gradient error at production batch
   (the r3 tests only pinned Sigmoid; ReLU mask flips diverge at small
   batch - measure the b=2^16 bound to pin in test_tpu_hw.py).
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc


def ppng3():
    from tcnn_tpu.ops.encodings.ppng import PPNG3Encoding

    enc = PPNG3Encoding(3)
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.standard_normal(enc.n_params).astype(np.float32) * 0.3
    )
    b = 1 << 16
    x = jnp.asarray(rng.uniform(0.02, 0.98, (b, 3)), jnp.float32)
    y = jax.jit(
        lambda p, xx: enc.apply_unpadded(
            p, xx, compute_dtype=jnp.float32, impl="pallas"
        )
    )(params, x)
    y_ref = np.asarray(
        enc.apply_unpadded(params, x[:4096], compute_dtype=jnp.float32,
                           impl="xla")
    )
    d = np.abs(np.asarray(y[:4096], np.float32) - y_ref)
    scale = np.abs(y_ref)
    print(f"ppng3 fwd: max abs {d.max():.2e}  p99.9 abs "
          f"{np.percentile(d, 99.9):.2e}  max rel@|y|>0.1 "
          f"{(d / np.maximum(scale, 0.1)).max():.2e}  "
          f"ref scale max {scale.max():.2f}", flush=True)


def relu_ig():
    from tcnn_tpu.ops.pallas.train_kernel import fused_apply_ig, supported_ig

    for act in ("ReLU", "Sigmoid"):
        model = tc.create_network_with_input_encoding(
            2, 3,
            {"otype": "HashGrid", "n_levels": 16,
             "n_features_per_level": 2, "log2_hashmap_size": 15,
             "base_resolution": 16, "per_level_scale": 1.5},
            {"otype": "FullyFusedMLP", "n_neurons": 64,
             "n_hidden_layers": 2, "activation": act},
        )
        model.encoding.fast_input_grads = True
        assert supported_ig(model)
        rng = np.random.default_rng(1)
        params = jnp.asarray(model.init_params(jax.random.PRNGKey(2)))
        n_net = model.network.n_params
        params = params.at[n_net:].set(
            jnp.asarray(
                rng.standard_normal(params.shape[0] - n_net).astype(
                    np.float32
                ) * 0.5
            )
        )
        b = 1 << 16
        x = jnp.asarray(rng.uniform(0.02, 0.98, (b, 2)), jnp.float32)
        gyw = jnp.asarray(
            rng.standard_normal((b, model.padded_output_width)).astype(
                np.float32
            )
        )

        def fused(p, xx):
            return jnp.sum(
                fused_apply_ig(model, p, xx).astype(jnp.float32) * gyw
            )

        def composed(p, xx):
            y = model.apply(p, xx, prepare_input_gradients=True,
                            _no_fused_ig=True)
            return jnp.sum(y.astype(jnp.float32) * gyw)

        gp, gx = jax.jit(jax.grad(fused, argnums=(0, 1)))(params, x)
        gp_ref, gx_ref = jax.jit(jax.grad(composed, argnums=(0, 1)))(
            params, x
        )
        for name, a, b_ in (("dparams", gp, gp_ref), ("dx", gx, gx_ref)):
            rel = float(
                jnp.linalg.norm(a - b_) / (jnp.linalg.norm(b_) + 1e-12)
            )
            print(f"ig {act} {name}: rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["ppng3", "relu_ig"]
    if "ppng3" in which:
        ppng3()
    if "relu_ig" in which:
        relu_ig()
