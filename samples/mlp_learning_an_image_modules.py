#!/usr/bin/env python
"""mlp_learning_an_image through the MODULE (binding-analog) API.

Port of intent of samples/mlp_learning_an_image_pytorch.py in the
reference (:64-196): the same image-regression task, but driven entirely
through the public `tcnn_tpu.NetworkWithInputEncoding` module surface with
an EXTERNAL optimizer (optax Adam here, torch.optim.Adam there) and a
loss defined OUTSIDE the library - the integration test for the
binding-style API (reference modules.py:209-249, bindings.cpp:79-171).

Like the reference sample it accepts a 4-block config JSON but only uses
its "encoding"/"network" blocks (the loss is the sample's own relative-L2
and the optimizer is external, mlp_learning_an_image_pytorch.py:100-116).

Usage:
    python samples/mlp_learning_an_image_modules.py [image.jpg] \
        [config.json] [n_steps] [output.jpg]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import tcnn_tpu as tc
from tcnn_tpu.common import mse2psnr
from tcnn_tpu.utils.image import (
    build_quad_table,
    load_image,
    pixel_center_coords,
    sample_image_quad,
    save_image,
    synthetic_image,
)

REFERENCE_IMAGE = "/root/reference/data/images/albert.jpg"


def relative_l2(y, targets):
    """The torch sample's own loss (mlp_learning_an_image_pytorch.py:109):
    (y - t)^2 / (sg(y)^2 + 0.01), mean-reduced."""
    denom = jax.lax.stop_gradient(y) ** 2 + 0.01
    return jnp.mean((y - targets) ** 2 / denom)


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    image_path = args[0] if len(args) > 0 else None
    config_path = (
        args[1]
        if len(args) > 1
        else os.path.join(
            os.path.dirname(__file__), "..", "data", "config_hash.json"
        )
    )
    n_steps = int(args[2]) if len(args) > 2 else 1000
    out_path = args[3] if len(args) > 3 else "out_modules.jpg"

    if image_path:
        image = load_image(image_path)
    elif os.path.exists(REFERENCE_IMAGE):
        image = load_image(REFERENCE_IMAGE)
    else:
        image = synthetic_image(512, 512)
    h, w = image.shape[:2]

    config = tc.load_config(config_path)
    module = tc.NetworkWithInputEncoding(
        n_input_dims=2,
        n_output_dims=3,
        encoding_config=config["encoding"],
        network_config=config["network"],
    )
    print(
        f"image {w}x{h}; module with {module.n_params} params, "
        f"{module.n_output_dims} outputs"
    )

    # --- the explicit fwd/bwd endpoints (bindings.cpp:79-171 analog) -------
    # one demonstration call: forward, caller-side loss gradient, backward
    # producing BOTH parameter and input gradients - the contract the
    # reference exposes as Module.fwd / Module.bwd.
    x_demo = jnp.asarray(np.random.default_rng(0).uniform(size=(512, 2)),
                         jnp.float32)
    t_demo = sample_image_quad(
        jax.jit(build_quad_table)(jnp.asarray(image)), h, w, x_demo
    )
    y_demo, vjp = module.fwd(x_demo)
    dL_dy = 2.0 * (y_demo - t_demo) / (y_demo.shape[0] * y_demo.shape[1])
    dparams, dx = module.bwd(vjp, dL_dy)
    print(
        f"fwd/bwd endpoints: |dL/dparams| sum {float(jnp.sum(jnp.abs(dparams))):.4f}, "
        f"dL/dx shape {tuple(dx.shape)}"
    )

    # --- training loop: module __call__ + external optax Adam --------------
    # (the torch sample's torch.optim.Adam(lr=1e-2) analog, :100)
    opt = optax.adam(learning_rate=1e-2, b1=0.9, b2=0.99, eps=1e-15)
    params = module.params
    opt_state = opt.init(params)

    quad = jax.jit(build_quad_table)(jnp.asarray(image))
    batch_size = 1 << 16

    @jax.jit
    def train_step(params, opt_state, quad, key):
        xy = jax.random.uniform(key, (batch_size, 2))
        rgb = sample_image_quad(quad, h, w, xy)

        def loss_fn(p):
            return relative_l2(module(xy, p), rgb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1337)
    print_interval = 10
    t0 = time.time()
    for step in range(1, n_steps + 1):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, quad, k)
        if step % print_interval == 0 or step == n_steps:
            jax.block_until_ready(loss)
            dt = time.time() - t0
            print(
                f"step {step}: loss {float(loss):.6e} "
                f"({step / dt:.1f} steps/s)"
            )
            if step // print_interval == 10:
                print_interval *= 10

    # --- render via the module (stateful params updated at the end) --------
    module.params = params
    eval_xy = jnp.asarray(pixel_center_coords(h, w))
    preds = []
    for i in range(0, eval_xy.shape[0], 1 << 20):
        preds.append(np.asarray(module(eval_xy[i : i + (1 << 20)])))
    pred = np.concatenate(preds).reshape(h, w, 3)
    mse = float(np.mean((pred - image) ** 2))
    print(f"final PSNR {float(mse2psnr(mse)):.2f} dB")
    save_image(out_path, pred)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
