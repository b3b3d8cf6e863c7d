"""Fused input-gradient megakernel parity tests (interpret mode).

fused_apply_ig runs the model backward (MLP dgrad/wgrad + grid scatter +
dL/dx) in ONE Pallas kernel; parity target is the composed
prepare_input_gradients path (grid ig Pallas kernels + XLA MLP), itself
pinned against autodiff/finite differences elsewhere. Second order must
flow through the composed fallback (_fib_bwd).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import tcnn_tpu as tc
from tcnn_tpu.ops.pallas.train_kernel import (
    fused_apply_ig,
    supported_ig,
)

F32 = jnp.float32


def _model(interp="Linear", n_dims=2, activation="Sigmoid"):
    # Sigmoid hidden units for the strict parity tests: ReLU's derivative
    # is discontinuous, so one-ulp bf16 differences between the fused and
    # composed forwards flip masks and make small-batch gradient norms
    # diverge by several percent (measured: 8 flips / 8192 -> 8% rel; the
    # reference's own gradcheck needs nondet_tol for the same reason,
    # test_grid_bwdbwd.py:124-138). A ReLU run is kept as a loose sanity
    # check below.
    config = {
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 9,
            "base_resolution": 4,
            "per_level_scale": 1.7,
            "interpolation": interp,
        },
        "network": {
            "otype": "FullyFusedMLP",
            "n_neurons": 16,
            "n_hidden_layers": 2,
            "activation": activation,
            "output_activation": "None",
        },
    }
    model = tc.create_network_with_input_encoding(
        n_dims, 1, config["encoding"], config["network"]
    )
    model.encoding.fast_input_grads = True
    return model


def _setup(seed=0, b=256, n_dims=2):
    model = _model(n_dims=n_dims)
    rng = np.random.default_rng(seed)
    params = jnp.asarray(model.init_params(jax.random.PRNGKey(3)))
    # grid params at O(1) so bf16 parity diffs are visible
    n_net = model.network.n_params
    params = params.at[n_net:].set(
        jnp.asarray(rng.standard_normal(params.shape[0] - n_net) * 0.5,
                    F32)
    )
    x = jnp.asarray(rng.uniform(0.05, 0.95, (b, n_dims)), F32)
    return model, params, x


def test_supported():
    model, _, _ = _setup()
    assert supported_ig(model)
    model.encoding.fast_input_grads = False
    assert not supported_ig(model)


def test_forward_and_first_order_parity():
    model, params, x = _setup()
    gyw = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (x.shape[0], model.padded_output_width)
        ),
        F32,
    )

    def composed(p, xx):
        y = model.apply(p, xx, prepare_input_gradients=True,
                        _no_fused_ig=True)
        return jnp.sum(y.astype(F32) * gyw)

    def fused(p, xx):
        y = fused_apply_ig(model, p, xx)
        return jnp.sum(y.astype(F32) * gyw)

    ref = composed(params, x)
    gp_ref, gx_ref = jax.grad(composed, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused(params, x)
        gp, gx = jax.grad(fused, argnums=(0, 1))(params, x)
    assert abs(float(got - ref)) / (abs(float(ref)) + 1e-6) < 2e-2
    rel = jnp.linalg.norm(gp - gp_ref) / (jnp.linalg.norm(gp_ref) + 1e-12)
    assert float(rel) < 2e-2, float(rel)
    rel = jnp.linalg.norm(gx - gx_ref) / (jnp.linalg.norm(gx_ref) + 1e-12)
    assert float(rel) < 2e-2, float(rel)


def test_routing_through_model_apply(monkeypatch):
    """model.apply(prepare_input_gradients=True) picks the fused path on
    the TPU backend (simulated here by patching default_backend)."""
    model, params, x = _setup(b=128)
    called = {}
    import tcnn_tpu.models.network_with_input_encoding as nwie

    real = fused_apply_ig

    def spy(m, p, xx):
        called["yes"] = True
        return real(m, p, xx)

    import tcnn_tpu.ops.pallas.train_kernel as tk

    monkeypatch.setattr(tk, "fused_apply_ig", spy)
    monkeypatch.setattr(nwie.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        y = model.apply(params, x, prepare_input_gradients=True)
        ref = model.apply(params, x, prepare_input_gradients=True,
                          _no_fused_ig=True)
    assert called.get("yes")
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_second_order_fallback():
    """Eikonal-style grad-of-grad: d/dparams of sum((dy/dx)^2) through the
    fused path must match the composed path (the _fib_bwd fallback)."""
    model, params, x = _setup(b=128, seed=4)

    def eik(apply_fn):
        def f(p):
            def point_sum(xx):
                return jnp.sum(apply_fn(p, xx).astype(F32))

            gx = jax.grad(point_sum)(x)
            return jnp.sum(gx * gx)

        return f

    composed = lambda p, xx: model.apply(
        p, xx, prepare_input_gradients=True, _no_fused_ig=True
    )
    fused = lambda p, xx: fused_apply_ig(model, p, xx)
    ref = jax.grad(eik(composed))(params)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(eik(fused))(params)
    rel = jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-12)
    assert float(rel) < 3e-2, float(rel)


def test_relu_loose_sanity():
    """ReLU path: same math modulo mask-flip boundary sensitivity (see
    _model docstring) - assert the loose envelope."""
    model, params, x = _setup()
    model2 = _model(activation="ReLU")

    def loss(apply_fn, p, xx):
        return jnp.sum(apply_fn(p, xx).astype(F32) ** 2)

    composed = lambda p, xx: model2.apply(
        p, xx, prepare_input_gradients=True, _no_fused_ig=True
    )
    params = params[: model2.n_params]
    gp_ref = jax.grad(lambda p: loss(composed, p, x))(params)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(
            lambda p: loss(
                lambda pp, xxx: fused_apply_ig(model2, pp, xxx), p, x
            )
        )(params)
    rel = jnp.linalg.norm(gp - gp_ref) / (jnp.linalg.norm(gp_ref) + 1e-12)
    assert float(rel) < 0.2, float(rel)


def test_smoothstep_and_3d():
    model = _model(interp="Smoothstep", n_dims=3)
    model.encoding.fast_input_grads = True
    rng = np.random.default_rng(7)
    params = jnp.asarray(model.init_params(jax.random.PRNGKey(5)))
    n_net = model.network.n_params
    params = params.at[n_net:].set(
        jnp.asarray(rng.standard_normal(params.shape[0] - n_net) * 0.5, F32)
    )
    x = jnp.asarray(rng.uniform(0.05, 0.95, (128, 3)), F32)

    def loss(apply_fn, p, xx):
        return jnp.sum(apply_fn(p, xx).astype(F32) ** 2)

    composed = lambda p, xx: model.apply(
        p, xx, prepare_input_gradients=True, _no_fused_ig=True
    )
    gp_ref, gx_ref = jax.grad(
        lambda p, xx: loss(composed, p, xx), argnums=(0, 1)
    )(params, x)
    with pltpu.force_tpu_interpret_mode():
        gp, gx = jax.grad(
            lambda p, xx: loss(
                lambda pp, xxx: fused_apply_ig(model, pp, xxx), p, xx
            ),
            argnums=(0, 1),
        )(params, x)
    rel = jnp.linalg.norm(gp - gp_ref) / (jnp.linalg.norm(gp_ref) + 1e-12)
    assert float(rel) < 3e-2, float(rel)
    rel = jnp.linalg.norm(gx - gx_ref) / (jnp.linalg.norm(gx_ref) + 1e-12)
    assert float(rel) < 3e-2, float(rel)
