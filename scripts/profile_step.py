"""Break the config_hash training step into parts and time each on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

B = 1 << 18


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = tc.load_config("/root/repo/data/config_hash.json")
    model = tc.create_from_config(2, 3, cfg)
    net = model.network  # NetworkWithInputEncoding
    enc = net.encoding
    mlp = net.network
    trainer = model.trainer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    params = trainer.state["params"]
    n_net = mlp.n_params
    enc_params = params[n_net:]
    net_params = params[:n_net]

    # grid forward alone (pallas path)
    gf = jax.jit(lambda p, xx: enc.apply(p, xx, needs_input_grad=False))
    print(f"grid_fwd: {timeit(gf, enc_params, x)*1e3:.2f} ms")

    # grid fwd+bwd
    def gloss(p, xx):
        y = enc.apply(p, xx, needs_input_grad=False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gg = jax.jit(jax.grad(gloss))
    print(f"grid_fwd+bwd: {timeit(gg, enc_params, x)*1e3:.2f} ms")

    # mlp forward alone (32-wide input)
    xin = jnp.asarray(rng.normal(size=(B, enc.padded_output_width)), jnp.bfloat16)
    mf = jax.jit(lambda p, xx: mlp.apply(p, xx))
    print(f"mlp_fwd: {timeit(mf, net_params, xin)*1e3:.2f} ms")

    def mloss(p, xx):
        return jnp.sum(mlp.apply(p, xx).astype(jnp.float32) ** 2)

    mg = jax.jit(jax.grad(mloss))
    print(f"mlp_fwd+bwd: {timeit(mg, net_params, xin)*1e3:.2f} ms")

    # full model fwd
    ff = jax.jit(lambda p, xx: net.apply(p, xx))
    print(f"model_fwd: {timeit(ff, params, x)*1e3:.2f} ms")

    # full train step
    st = jax.jit(trainer.train_step_fn)
    state = trainer.state
    out = st(state, x, t)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        state, lv = st(state, x, t)
    jax.block_until_ready(lv)
    dt = (time.perf_counter() - t0) / 30
    print(f"train_step: {dt*1e3:.2f} ms -> {B/dt/1e6:.1f} M samples/s")


if __name__ == "__main__":
    main()
