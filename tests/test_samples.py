"""App-level smoke tests for the samples' API usage patterns.

The reference treats its samples as integration tests (SURVEY.md §4 item
5); these tests exercise the same public surfaces the samples drive, at
CPU-friendly shapes: the module (binding-analog) API end-to-end with an
external optimizer (mlp_learning_an_image_pytorch.py:64-196 analog).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tcnn_tpu as tc

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "samples")
)


ENC = {
    "otype": "HashGrid",
    "n_levels": 4,
    "n_features_per_level": 2,
    "log2_hashmap_size": 9,
    "base_resolution": 4,
    "per_level_scale": 2.0,
}
NET = {
    "otype": "FullyFusedMLP",
    "activation": "ReLU",
    "output_activation": "None",
    "n_neurons": 16,
    "n_hidden_layers": 1,
}


def test_modules_sample_loss_matches_formula():
    from mlp_learning_an_image_modules import relative_l2

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    want = np.mean(np.asarray((y - t) ** 2) / (np.asarray(y) ** 2 + 0.01))
    np.testing.assert_allclose(float(relative_l2(y, t)), want, rtol=1e-6)
    # stop_gradient on the denominator: d/dy of (y-t)^2/(sg(y)^2+eps)
    g = jax.grad(lambda yy: relative_l2(yy, t))(y)
    want_g = 2 * (np.asarray(y) - np.asarray(t)) / (
        np.asarray(y) ** 2 + 0.01
    ) / y.size
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-5)


def test_modules_api_with_external_optimizer_converges():
    """The mlp_learning_an_image_pytorch analog end-to-end: module
    __call__ under jax.value_and_grad + optax Adam decreases the loss,
    and the explicit fwd/bwd endpoints produce both grads."""
    module = tc.NetworkWithInputEncoding(
        n_input_dims=2, n_output_dims=3, encoding_config=ENC,
        network_config=NET,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
    target = jnp.asarray(
        np.stack(
            [np.sin(4 * np.asarray(x[:, 0])), np.asarray(x[:, 1]),
             np.asarray(x).prod(axis=1)],
            axis=1,
        ),
        jnp.float32,
    )

    opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    params = module.params
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            y = module(x, p)
            d = jax.lax.stop_gradient(y) ** 2 + 0.01
            return jnp.mean((y - target) ** 2 / d)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[:: len(losses) // 4]

    # explicit binding endpoints (bindings.cpp:79-171 analog)
    module.params = params
    y, vjp = module.fwd(x)
    dL_dy = 2.0 * (y - target) / y.size
    dparams, dx = module.bwd(vjp, dL_dy)
    assert dparams.shape == params.shape
    assert dx.shape == x.shape
    assert float(jnp.sum(jnp.abs(dparams))) > 0
    assert float(jnp.sum(jnp.abs(dx))) > 0
    assert np.all(np.isfinite(np.asarray(dx)))

    # GradientMode semantics at the binding boundary (object.h:115-119)
    from tcnn_tpu.common import GradientMode

    dp_none, dx2 = module.bwd(vjp, dL_dy, gradient_mode=GradientMode.Ignore)
    assert dp_none is None
    np.testing.assert_array_equal(np.asarray(dx2), np.asarray(dx))
    acc0 = jnp.ones_like(dparams)
    dp_acc, _ = module.bwd(
        vjp, dL_dy, gradient_mode=GradientMode.Accumulate, param_grads=acc0
    )
    np.testing.assert_allclose(
        np.asarray(dp_acc), np.asarray(dparams + acc0), rtol=1e-6
    )
    with pytest.raises(ValueError):
        module.bwd(vjp, dL_dy, gradient_mode=GradientMode.Accumulate)
