"""Round-5 receipts: scan-chained (honest device time) training-step
numbers for the PPNG family — the fork's flagship encodings. The
round-4 PPNG3 437 ms figure came from an eager per-dispatch loop; all
loops here chain SCAN steps per dispatch so the axon tunnel's
per-dispatch overhead (~8 ms/call measured round 5) is amortized out.

Usage: python -u scripts/receipts_r5.py [ppng1 ppng2 ppng3]
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

B = 1 << 17
SCAN = 8


def step_rate(otype):
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": otype},  # factory defaults (ppng_1.h:340-378)
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    tm = tc.create_from_config(3, 3, cfg)
    tr = tm.trainer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (B, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    def multi(state, x0):
        def body(carry, _):
            st, xx = carry
            st2, loss = tr.train_step_fn(st, xx, t)
            return (st2, x0 + loss * 1e-30), loss

        (stf, xf), losses = jax.lax.scan(body, (state, x0), None,
                                         length=SCAN)
        return stf, xf, losses[-1]

    jf = jax.jit(multi)
    t0 = time.time()
    st, xf, loss = jf(tr.state, x)
    np.asarray(loss)
    comp = time.time() - t0
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        st, xf, loss = jf(st, xf)
    np.asarray(loss)
    dt = (time.time() - t0) / (iters * SCAN)
    print(f"{otype} train step b=2^17: {dt*1e3:.1f} ms = "
          f"{B/dt/1e6:.2f} M samples/s (compile {comp:.0f}s, "
          f"loss {float(loss):.3e})", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["ppng1", "ppng2", "ppng3"]
    for name in which:
        step_rate(name.upper())
