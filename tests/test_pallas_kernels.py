"""Pallas kernel parity tests (interpret mode on CPU).

The TPU kernels (ops/pallas/) are validated against the XLA oracle paths:
same forward values within bf16 tolerance, same table gradients. This is
the CI stand-in for the on-TPU runs (the kernels compile for Mosaic only on
real hardware; interpret mode executes the same program).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tcnn_tpu.common import GridType, InterpolationType
from tcnn_tpu.models.mlp import FullyFusedMLP
from tcnn_tpu.ops.encodings.grid import GridEncoding
from tcnn_tpu.ops.pallas import grid_kernel as gk
from tcnn_tpu.ops.pallas import mlp_kernel as mk


CASES = [
    (GridType.Hash, InterpolationType.Linear, 2, 2),
    (GridType.Hash, InterpolationType.Smoothstep, 3, 4),
    (GridType.Dense, InterpolationType.Linear, 2, 1),
    (GridType.Tiled, InterpolationType.Nearest, 3, 2),
    (GridType.Hash, InterpolationType.Linear, 4, 2),
]


@pytest.mark.parametrize("gt,interp,d,f", CASES)
def test_grid_kernel_parity(gt, interp, d, f):
    enc = GridEncoding(
        d,
        n_levels=5,
        n_features_per_level=f,
        log2_hashmap_size=10,
        base_resolution=4,
        per_level_scale=1.6,
        grid_type=gt,
        interpolation=interp,
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=256)
    assert plan is not None
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (512, d)), jnp.float32)

    ref = np.asarray(enc._apply_xla(params, x, compute_dtype=jnp.float32))
    coefs = jnp.asarray(rng.normal(size=plan.out_width), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y = gk.grid_encode_pallas(plan, params, x)

        def loss_pallas(p):
            yy = gk.grid_encode_pallas(plan, p, x)
            return jnp.sum(yy.astype(jnp.float32) * coefs)

        gp = np.asarray(jax.grad(loss_pallas)(params))

    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=2e-2)

    def loss_xla(p):
        yy = enc._apply_xla(p, x, compute_dtype=jnp.float32)
        return jnp.sum(yy * coefs)

    gx = np.asarray(jax.grad(loss_xla)(params))
    scale = max(np.abs(gx).max(), 1e-9)
    np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-2)


def test_grid_kernel_unsupported_configs():
    from tcnn_tpu.common import HashType

    enc2 = GridEncoding(2, n_levels=2)
    enc2.hash_type = HashType.Rng
    # Rng is now supported via the precomputed-hash input
    assert gk.plan_for(enc2).ext_hash


def test_grid_kernel_stochastic_scatter():
    """Stochastic interpolation in the Pallas path (grid.h:284-299): the
    forward is exact; the backward scatters each (sample, level) gradient
    to ONE corner (weight 1) at M=Nt cost. Checked: fwd parity, gradient
    determinism, per-level mass conservation, integer-count scatters."""
    enc = GridEncoding(
        2,
        n_levels=3,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.7,
        stochastic_interpolation=True,
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=128)
    assert plan.stochastic
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (256, 2)), jnp.float32)

    ref = np.asarray(enc._apply_xla(params, x, compute_dtype=jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        y = gk.grid_encode_pallas(plan, params, x)

        def loss(p):
            return jnp.sum(
                gk.grid_encode_pallas(plan, p, x).astype(jnp.float32)
            )

        g1 = np.asarray(jax.grad(loss)(params))
        g2 = np.asarray(jax.grad(loss)(params))

    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=2e-2)
    np.testing.assert_array_equal(g1, g2)
    # dL/dy = 1 everywhere: each (sample, level) scatters exactly 1 per
    # feature -> per-level mass = batch size; single-corner counts integer
    F = enc.n_features_per_level
    for lvl in range(3):
        off = int(enc._offsets[lvl]) * F
        size = int(enc._sizes[lvl]) * F
        np.testing.assert_allclose(
            g1[off : off + size].sum(), 2 * 256, rtol=1e-4
        )
    assert np.allclose(g1, np.round(g1), atol=1e-3)


def test_fused_mlp_parity():
    mlp = FullyFusedMLP(32, 3, n_neurons=64, n_hidden_layers=2)
    rng = np.random.default_rng(1)
    params = jnp.asarray(mlp.init_params(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.normal(size=(256, 32)), jnp.float32)

    ref = np.asarray(
        mlp.apply(params, x.astype(jnp.bfloat16)), np.float32
    )
    with pltpu.force_tpu_interpret_mode():
        y = mk.fused_mlp_apply(mlp, params, x)
        y = np.asarray(y, np.float32)
    np.testing.assert_allclose(y, ref, atol=0.15, rtol=0.1)


def test_fused_mlp_grads_parity():
    mlp = FullyFusedMLP(16, 4, n_neurons=32, n_hidden_layers=2)
    rng = np.random.default_rng(2)
    params = jnp.asarray(mlp.init_params(jax.random.PRNGKey(3)))
    x = jnp.asarray(rng.normal(size=(128, 16)), jnp.float32)

    def loss_ref(p, xx):
        return jnp.sum(mlp.apply(p, xx.astype(jnp.bfloat16)).astype(jnp.float32) ** 2)

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    with pltpu.force_tpu_interpret_mode():

        def loss_k(p, xx):
            return jnp.sum(
                mk.fused_mlp_apply(mlp, p, xx).astype(jnp.float32) ** 2
            )

        gk_p, gk_x = jax.grad(loss_k, argnums=(0, 1))(params, x)

    sp = max(float(jnp.abs(gr_p).max()), 1e-9)
    np.testing.assert_allclose(
        np.asarray(gk_p) / sp, np.asarray(gr_p) / sp, atol=5e-2
    )
    sx = max(float(jnp.abs(gr_x).max()), 1e-9)
    np.testing.assert_allclose(
        np.asarray(gk_x) / sx, np.asarray(gr_x) / sx, atol=5e-2
    )


@pytest.mark.parametrize(
    "interp,d",
    [(InterpolationType.Linear, 2), (InterpolationType.Smoothstep, 3)],
)
def test_grid_input_grad_kernel_parity(interp, d):
    """kernel_grid_backward_input parity (grid.h:322-349): the fused
    scatter+input-grad backward matches XLA autodiff for BOTH the table
    gradients and dL/dx (first order)."""
    rng = np.random.default_rng(0)
    enc = GridEncoding(
        d, n_levels=5, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=4, per_level_scale=1.6, interpolation=interp,
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=256)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (300, d)), jnp.float32)
    coefs = jnp.asarray(rng.normal(size=plan.out_width), jnp.float32)

    def loss_xla(p, xx):
        y = enc._apply_xla(p, xx, compute_dtype=jnp.float32)
        return jnp.sum(y * coefs)

    gp_ref, gx_ref = jax.grad(loss_xla, argnums=(0, 1))(params, x)

    with pltpu.force_tpu_interpret_mode():

        def loss_ig(p, xx):
            y = gk.grid_encode_pallas_ig(plan, p, xx)
            return jnp.sum(y.astype(jnp.float32) * coefs)

        gp, gx = jax.grad(loss_ig, argnums=(0, 1))(params, x)

    sp = max(np.abs(np.asarray(gp_ref)).max(), 1e-9)
    sx = max(np.abs(np.asarray(gx_ref)).max(), 1e-9)
    np.testing.assert_allclose(
        np.asarray(gp) / sp, np.asarray(gp_ref) / sp, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(gx) / sx, np.asarray(gx_ref) / sx, atol=2e-2
    )


@pytest.mark.parametrize("d", [2, 3])
def test_rng_hash_kernel_parity(d):
    """HashType.Rng Pallas plan (VERDICT r1 item 6): the PCG32-advance hash
    is precomputed outside the kernel (compute_ext_hash) and passed in; the
    kernel's cell math must match the precompute's bit-for-bit, and outputs
    and table gradients must match the XLA oracle."""
    from tcnn_tpu.common import HashType

    enc = GridEncoding(
        d,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.8,
        hash_type=HashType.Rng,
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=256)
    assert plan is not None and plan.ext_hash
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (256, d)), jnp.float32)

    ref = np.asarray(enc._apply_xla(params, x, compute_dtype=jnp.float32))
    coefs = jnp.asarray(rng.normal(size=plan.out_width), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y = gk.grid_encode_pallas(plan, params, x)

        def loss_pallas(p):
            yy = gk.grid_encode_pallas(plan, p, x)
            return jnp.sum(yy.astype(jnp.float32) * coefs)

        gp = np.asarray(jax.grad(loss_pallas)(params))

    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=2e-2)

    def loss_xla(p):
        yy = enc._apply_xla(p, x, compute_dtype=jnp.float32)
        return jnp.sum(yy * coefs)

    gx = np.asarray(jax.grad(loss_xla)(params))
    scale = max(np.abs(gx).max(), 1e-9)
    np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-2)


def test_rng_hash_stochastic_kernel_parity():
    """Rng hash + stochastic scatter: the chosen-corner index selection
    from the precomputed per-corner hashes must match the XLA stochastic
    path's scatter destinations (same shared corner uniforms)."""
    from tcnn_tpu.common import HashType

    enc = GridEncoding(
        2,
        n_levels=3,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.8,
        hash_type=HashType.Rng,
        stochastic_interpolation=True,
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=256)
    assert plan.stochastic and plan.ext_hash
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (256, 2)), jnp.float32)
    coefs = jnp.asarray(rng.normal(size=plan.out_width), jnp.float32)

    with pltpu.force_tpu_interpret_mode():

        def loss_pallas(p):
            yy = gk.grid_encode_pallas(plan, p, x)
            return jnp.sum(yy.astype(jnp.float32) * coefs)

        gp = np.asarray(jax.grad(loss_pallas)(params))

    def loss_xla(p):
        yy = enc._apply_stochastic(p, x, jnp.float32, None,
                                   needs_input_grad=False)
        return jnp.sum(yy.astype(jnp.float32) * coefs)

    gx = np.asarray(jax.grad(loss_xla)(params))
    scale = max(np.abs(gx).max(), 1e-9)
    np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-2)


@pytest.mark.parametrize("interp", ["Linear", "Smoothstep"])
def test_ig_second_order_parity(interp):
    """The ig path's backward is differentiable: grad-of-grad (the
    reference's backward_backward_input trio, grid.h:351-650) through the
    Pallas kernels must match the XLA autodiff oracle - eikonal-style
    losses train on the fast path (VERDICT r1 item 5)."""
    from tcnn_tpu.common import InterpolationType
    from tcnn_tpu.ops.pallas.grid_kernel import grid_encode_pallas_ig

    enc = GridEncoding(
        2,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=1.7,
        interpolation=InterpolationType(interp),
    )
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=256)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (128, 2)), jnp.float32)
    coefs = jnp.asarray(rng.normal(size=enc.n_output_dims), jnp.float32)
    v = jnp.asarray(rng.normal(size=(128, 2)), jnp.float32)

    def make_loss(encode):
        def gx_fn(p, xx):
            return jax.grad(
                lambda xq: jnp.sum(
                    encode(p, xq).astype(jnp.float32) * coefs
                )
            )(xx)

        def loss2(p, xx):
            g = gx_fn(p, xx)  # [B, 2] - eikonal-style second-order use
            return jnp.sum((g * v) ** 2)

        return loss2

    loss_pallas = make_loss(lambda p, xx: grid_encode_pallas_ig(plan, p, xx))
    loss_xla = make_loss(
        lambda p, xx: enc._apply_xla(p, xx, compute_dtype=jnp.float32)
    )

    with pltpu.force_tpu_interpret_mode():
        val_p = float(loss_pallas(params, x))
        gp_params, gp_x = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    val_r = float(loss_xla(params, x))
    gr_params, gr_x = jax.grad(loss_xla, argnums=(0, 1))(params, x)

    assert abs(val_p - val_r) / (abs(val_r) + 1e-9) < 2e-2
    sp = max(float(jnp.abs(gr_params).max()), 1e-9)
    np.testing.assert_allclose(
        np.asarray(gp_params) / sp, np.asarray(gr_params) / sp, atol=3e-2
    )
    sx = max(float(jnp.abs(gr_x).max()), 1e-9)
    np.testing.assert_allclose(
        np.asarray(gp_x) / sx, np.asarray(gr_x) / sx, atol=3e-2
    )
