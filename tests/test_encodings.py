"""Fixed-function encoding parity tests.

Each test checks our jnp implementations against independently-written
formulas from the reference kernels (frequency.h:66-75, triangle_wave.h:69-76,
oneblob.h:70-96, common_device.h:339-629, identity.h:60-66).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.ops.encodings.fixed import (
    EmptyEncoding,
    FrequencyEncoding,
    IdentityEncoding,
    OneBlobEncoding,
    SphericalHarmonicsEncoding,
    TriangleWaveEncoding,
)
from tcnn_tpu.ops.encodings.composite import CompositeEncoding
from tcnn_tpu.common import ReductionType
from tcnn_tpu.registry import create_encoding

F32 = jnp.float32


def test_identity():
    enc = IdentityEncoding(3, scale=2.0, offset=0.5)
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    y = enc.apply(None, x, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(y), [[0.7, 0.9, 1.1]], rtol=1e-6)


def test_identity_padding_ones():
    enc = IdentityEncoding(3)
    enc.set_alignment(8)
    assert enc.padded_output_width == 8
    y = enc.apply(None, jnp.zeros((2, 3)), compute_dtype=F32)
    assert y.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(y[:, 3:]), 1.0)


def test_empty():
    enc = EmptyEncoding(4)
    assert enc.n_output_dims == 0
    enc.set_alignment(16)
    # next_multiple(0, 16) == 0: zero-width stays zero-width (encoding.h:53-72)
    y = enc.apply(None, jnp.zeros((2, 4)), compute_dtype=F32)
    assert y.shape == (2, 0)


def test_frequency_values_and_order():
    # frequency.h:66-75: per input dim, per frequency k: sin(2^k pi x),
    # cos(2^k pi x), interleaved sin/cos.
    enc = FrequencyEncoding(2, 3)
    x = np.array([[0.13, 0.77]], np.float32)
    y = np.asarray(enc.apply(None, jnp.asarray(x), compute_dtype=F32))[0]
    expected = []
    for d in range(2):
        for k in range(3):
            arg = (2.0**k) * x[0, d] * np.pi
            expected += [np.sin(arg), np.cos(arg)]
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_triangle_wave_values():
    enc = TriangleWaveEncoding(1, 4)
    x = np.array([[0.37]], np.float32)
    y = np.asarray(enc.apply(None, jnp.asarray(x), compute_dtype=F32))[0]
    expected = []
    for k in range(4):
        xs = x[0, 0] * 2.0 ** (k - 1)
        val = xs + k * 0.25
        expected.append(abs(val - np.floor(val) - 0.5) * 4 - 1)
    np.testing.assert_allclose(y, expected, atol=1e-6)


def _quartic_cdf(x, inv_radius):
    u = x * inv_radius
    return float(
        np.clip(15 / 16 * u * (1 - 2 / 3 * u**2 + 1 / 5 * u**4) + 0.5, 0, 1)
    )


def test_oneblob_values():
    n_bins = 4
    enc = OneBlobEncoding(1, n_bins)
    x = np.array([[0.42]], np.float32)
    y = np.asarray(enc.apply(None, jnp.asarray(x), compute_dtype=F32))[0]

    def wrapped(t):
        return sum(_quartic_cdf(t + s, n_bins) for s in (0.0, -1.0, 1.0))

    expected = []
    for k in range(n_bins):
        left = k / n_bins - x[0, 0]
        right = (k + 1) / n_bins - x[0, 0]
        expected.append(wrapped(right) - wrapped(left))
    np.testing.assert_allclose(y, expected, atol=1e-6)
    # partitions of unity (wraparound makes bins sum to ~1)
    assert abs(sum(expected) - 1.0) < 1e-5


def test_oneblob_partition_of_unity_batch():
    enc = OneBlobEncoding(3, 8)
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 3))
    y = np.asarray(enc.apply(None, x, compute_dtype=F32)).reshape(32, 3, 8)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-4)


def test_spherical_harmonics_low_degrees():
    """Check against the hard-coded polynomials (common_device.h:348-357)."""
    enc = SphericalHarmonicsEncoding(3, 3)
    v = np.array([0.3, -0.5, 0.8])
    x01 = (v + 1.0) / 2.0
    y = np.asarray(
        enc.apply(None, jnp.asarray(x01[None]), compute_dtype=F32)
    )[0]
    x_, y_, z_ = v
    expected = [
        0.28209479177387814,
        -0.48860251190291987 * y_,
        0.48860251190291987 * z_,
        -0.48860251190291987 * x_,
        1.0925484305920792 * x_ * y_,
        -1.0925484305920792 * y_ * z_,
        0.94617469575755997 * z_ * z_ - 0.31539156525251999,
        -1.0925484305920792 * x_ * z_,
        0.54627421529603959 * (x_ * x_ - y_ * y_),
    ]
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_spherical_harmonics_degree8_orthonormal():
    """Monte-Carlo orthonormality of the full degree-8 basis: guards the
    recurrence at high l, where hand-checking constants is impractical."""
    enc = SphericalHarmonicsEncoding(3, 8)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    y = np.asarray(
        enc.apply(None, jnp.asarray((v + 1) / 2, jnp.float32), compute_dtype=F32)
    )
    gram = (y.T @ y) / y.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(64), atol=0.15)


def test_sh_pads_front():
    enc = SphericalHarmonicsEncoding(3, 2)
    enc.set_alignment(8)
    y = np.asarray(
        enc.apply(None, jnp.full((1, 3), 0.5), compute_dtype=F32)
    )[0]
    # 4 pad ones first (spherical_harmonics.h:57-63), then the SH values
    np.testing.assert_allclose(y[:4], 1.0)
    assert abs(y[4] - 0.28209479) < 1e-5


def test_composite_concatenation():
    enc = create_encoding(
        8,
        {
            "otype": "Composite",
            "nested": [
                {"n_dims_to_encode": 3, "otype": "TriangleWave", "n_frequencies": 2},
                {"n_dims_to_encode": 5, "otype": "OneBlob", "n_bins": 4},
            ],
        },
    )
    assert enc.n_output_dims == 3 * 2 + 5 * 4
    enc.set_alignment(16)
    assert enc.padded_output_width == 32
    y = enc.apply(
        jnp.zeros((0,)), jax.random.uniform(jax.random.PRNGKey(0), (4, 8)),
        compute_dtype=F32,
    )
    assert y.shape == (4, 32)


def test_composite_inferred_identity_dims():
    enc = create_encoding(
        10,
        {
            "otype": "Composite",
            "nested": [
                {"n_dims_to_encode": 3, "otype": "Frequency", "n_frequencies": 2},
                {"otype": "Identity"},
            ],
        },
    )
    # remaining 7 dims inferred for Identity
    assert enc.n_output_dims == 3 * 2 * 2 + 7


def test_composite_sum_reduction():
    enc = create_encoding(
        2,
        {
            "otype": "Composite",
            "reduction": "Sum",
            "nested": [
                {"n_dims_to_encode": 1, "otype": "OneBlob", "n_bins": 4},
                {"n_dims_to_encode": 1, "otype": "OneBlob", "n_bins": 4},
            ],
        },
    )
    assert enc.n_output_dims == 4
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2))
    y = np.asarray(enc.apply(jnp.zeros((0,)), x, compute_dtype=F32))
    a = np.asarray(OneBlobEncoding(1, 4).apply(None, x[:, :1], compute_dtype=F32))
    b = np.asarray(OneBlobEncoding(1, 4).apply(None, x[:, 1:], compute_dtype=F32))
    np.testing.assert_allclose(y, a + b, atol=1e-6)


def test_nrc_preset():
    enc = create_encoding(12, {"otype": "NRC"})
    # TriangleWave(3, 12) + OneBlob(5, 4) + Identity(4)
    assert enc.n_output_dims == 3 * 12 + 5 * 4 + 4


@pytest.mark.parametrize(
    "enc_factory",
    [
        lambda: FrequencyEncoding(2, 3),
        lambda: TriangleWaveEncoding(2, 3),
        lambda: OneBlobEncoding(2, 4),
        lambda: SphericalHarmonicsEncoding(3, 4),
        lambda: IdentityEncoding(2, scale=3.0, offset=0.1),
    ],
)
def test_input_gradients_match_finite_differences(enc_factory):
    enc = enc_factory()
    d = enc.n_dims_to_encode
    x0 = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (4, d), minval=0.2, maxval=0.8)
    ).astype(np.float64)

    def f(x):
        return jnp.sum(
            jnp.sin(enc.apply(None, x, compute_dtype=jnp.float32) * 1.7)
        )

    g = np.asarray(jax.grad(f)(jnp.asarray(x0, jnp.float32)))
    eps = 1e-3
    for i in range(4):
        for j in range(d):
            xp, xm = x0.copy(), x0.copy()
            xp[i, j] += eps
            xm[i, j] -= eps
            fd = (
                float(f(jnp.asarray(xp, jnp.float32)))
                - float(f(jnp.asarray(xm, jnp.float32)))
            ) / (2 * eps)
            # triangle wave is only piecewise smooth; tolerate kinks
            np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=2e-2)


def test_quad_sampling_matches_reference_bilinear():
    """build_quad_table + sample_image_quad == sample_image exactly,
    including out-of-range (edge-clamped) coordinates."""
    from tcnn_tpu.utils.image import (
        build_quad_table,
        sample_image,
        sample_image_quad,
        synthetic_image,
    )

    img = synthetic_image(37, 53)
    quad = build_quad_table(img)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.1, 1.1, (500, 2)), jnp.float32)
    got = sample_image_quad(quad, 37, 53, xy)
    ref = sample_image(img, xy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_packed_quad_sampling_exact_on_8bit():
    """The u32-packed quad table reproduces sample_image_quad EXACTLY on
    8-bit-quantized images (the load_image class: k/255 values), including
    edge-clamped out-of-range coordinates."""
    from tcnn_tpu.utils.image import (
        build_quad_table,
        build_quad_table_packed,
        sample_image_quad,
        sample_image_quad_packed,
        synthetic_image,
    )

    img = synthetic_image(37, 53)
    img8 = np.round(np.asarray(img) * 255.0) / 255.0  # what load_image yields
    quad = build_quad_table(jnp.asarray(img8, jnp.float32))
    packed = build_quad_table_packed(jnp.asarray(img8, jnp.float32))
    assert packed.dtype == jnp.uint32 and packed.shape == (37 * 53, 3)
    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(-0.1, 1.1, (500, 2)), jnp.float32)
    got = sample_image_quad_packed(packed, 37, 53, xy)
    ref = sample_image_quad(quad, 37, 53, xy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
