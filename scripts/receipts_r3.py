"""Round-3 receipt measurements still owed to PERF.md (run on the TPU):

  1. PPNG3 training throughput on the binned ext_iw fast path
     (VERDICT r2 item 8: "PPNG3 throughput recorded in PERF.md").
  2. Input-gradient (dy_dx) training step at the reference-default
     T=2^19 on the binned path, b=2^18 (VERDICT r2 item 2: <= 150 ms).
  3. Fused inference step on config_hash (VERDICT r2 item 6 context).

Each section prints as it completes (cold compiles for the binned
sections can take minutes; run under `python -u`). Items can be selected
by name: python -u scripts/receipts_r3.py [ppng3 ig infer]
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


def timeit(fn, *args, iters=20):
    t0 = time.time()
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters, compile_s


def target3(x):
    return jnp.stack(
        [jnp.sin(4 * x[:, 0]) * 0.5 + 0.5, x[:, 1] * x[:, 2], x[:, 0]], -1
    )


def sec_ppng3():
    b = 1 << 17
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "PPNG3"},  # defaults: Q64 F6(->freqs) C4 R1
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    m = tc.create_from_config(3, 3, cfg)
    enc = m.network.encoding
    assert enc._fast_plan() is not None, (
        "PPNG3 receipt must measure the binned ext_iw fast path"
    )
    tr = m.trainer
    x = jax.random.uniform(jax.random.PRNGKey(0), (b, 3))
    t = target3(x)

    def step(state, xx, tt):
        return tr.train_step_fn(state, xx, tt)

    f = jax.jit(step, donate_argnums=(0,))
    st = jax.tree.map(jnp.copy, tr.state)
    t0 = time.time()
    st, lv = f(st, x, t)
    np.asarray(lv)
    print(f"  compile {time.time()-t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(20):
        st, lv = f(st, x, t)
    np.asarray(lv)
    dt = (time.perf_counter() - t0 - 0.03) / 20
    print(f"1. PPNG3 train step b=2^17: {dt*1e3:7.2f} ms -> "
          f"{b/dt/1e6:.2f} M samples/s (loss {float(lv):.3e})")


def sec_ig():
    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
        "encoding": {"otype": "HashGrid", "n_levels": 16,
                     "n_features_per_level": 2, "log2_hashmap_size": 19,
                     "base_resolution": 16, "per_level_scale": 1.382},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    m = tc.create_from_config(3, 1, cfg)
    net = m.network
    assert net.encoding._binned_split() is not None, "must be binned"
    params = m.trainer.state["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))

    # eikonal-style: loss needs dy/dx (first order through the binned ig
    # kernels; this is the SDF workload at the reference-default table)
    def loss_fn(p, xx):
        gx = jax.grad(
            lambda z: jnp.sum(
                net.apply(
                    p, z, prepare_input_gradients=True
                )[:, 0].astype(jnp.float32)
            )
        )(xx)
        return jnp.mean((jnp.linalg.norm(gx, axis=-1) - 1.0) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    dt, compile_s = timeit(g, params, x, iters=10)
    print(f"2. binned ig train grad b=2^18 T=2^19: {dt*1e3:7.2f} ms "
          f"(compile {compile_s:.0f}s) -> {B/dt/1e6:.2f} M samples/s")


def sec_infer():
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    config = tc.load_config("data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    params = m.trainer.state["params"]
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, 2))
    f = jax.jit(lambda p, xx: fused_forward(m.network, p, xx))
    dt, compile_s = timeit(f, params, x, iters=30)
    print(f"3. fused inference b=2^18 config_hash: {dt*1e3:7.2f} ms "
          f"(compile {compile_s:.0f}s) -> {B/dt/1e6:.2f} M samples/s")
    # end-to-end Trainer.inference (includes trim + f32 cast)
    out = m.trainer.inference(x)
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(30):
        out = m.trainer.inference(x)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0 - 0.03) / 30
    print(f"   Trainer.inference          : {dt*1e3:7.2f} ms -> "
          f"{B/dt/1e6:.2f} M samples/s")


SECTIONS = {"ppng3": sec_ppng3, "ig": sec_ig, "infer": sec_infer}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    for n in names:
        print(f"== {n} ==", flush=True)
        SECTIONS[n]()
