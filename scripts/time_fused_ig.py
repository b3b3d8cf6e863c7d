"""fused_apply_ig step time at config_hash scale (VERDICT r3 item 5:
'fused_apply_ig step time... target <= the 67 ms composed number').
Times grad-of-(fused forward) - i.e. the ig megakernel backward - vs the
composed prepare_input_gradients route, b=2^18, ReLU."""
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
from tcnn_tpu.ops.pallas.train_kernel import fused_apply_ig, supported_ig

B = 1 << 18


def main():
    model = tc.create_network_with_input_encoding(
        2, 3,
        {"otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
         "log2_hashmap_size": 15, "base_resolution": 16,
         "per_level_scale": 1.5},
        {"otype": "FullyFusedMLP", "n_neurons": 64, "n_hidden_layers": 2},
    )
    model.encoding.fast_input_grads = True
    assert supported_ig(model)
    rng = np.random.default_rng(1)
    params = jnp.asarray(model.init_params(jax.random.PRNGKey(2)))
    x = jnp.asarray(rng.uniform(0.02, 0.98, (B, 2)), jnp.float32)
    gyw = jnp.asarray(
        rng.standard_normal((B, model.padded_output_width)).astype(
            np.float32
        )
    )

    def fused(p, xx):
        return jnp.sum(fused_apply_ig(model, p, xx).astype(jnp.float32) * gyw)

    def composed(p, xx):
        y = model.apply(p, xx, prepare_input_gradients=True,
                        _no_fused_ig=True)
        return jnp.sum(y.astype(jnp.float32) * gyw)

    # scan-chained steps (8 per dispatch): eager per-dispatch loops pay
    # the axon tunnel's per-dispatch overhead (~8 ms/call measured round
    # 5), which drowned the device time in the round-4 numbers (58.5 ms
    # eager vs 19.5 ms device for the fused path)
    SCAN = 8
    for name, f in (("fused_apply_ig", fused), ("composed_ig", composed)):
        g = jax.grad(f, argnums=(0, 1))

        def multi(p0, x0):
            def body(carry, _):
                p_c, x_c = carry
                gp, gx = g(p_c, x_c)
                return (p0 + gp * 1e-30, x0 + gx * 1e-30), gp[0]

            (pf, xf), deps = jax.lax.scan(body, (p0, x0), None, length=SCAN)
            return pf, xf, deps[-1]

        jf = jax.jit(multi)
        t0 = time.time()
        pf, xf, dep = jf(params, x)
        np.asarray(dep)
        comp = time.time() - t0
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            pf, xf, dep = jf(pf, xf)
        np.asarray(dep)
        dt = (time.time() - t0) / (iters * SCAN)
        print(f"{name}: {dt*1e3:.2f} ms/step (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
