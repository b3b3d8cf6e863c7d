"""Native host runtime tests (native/tcnn_host.cpp via tcnn_tpu.native).

The C++ library must agree bit-for-bit with the numpy fallback and with the
python-int PCG32 oracle; both reproduce the reference's generate_random
stream layout (random.h:39-66) and pcg32 seeding (pcg32.h:53-59).
"""

import numpy as np
import pytest

from tcnn_tpu.native import HostRng, native_available, sample_image_bilinear
from tcnn_tpu.ops.pcg32 import host_pcg32_init

requires_native = pytest.mark.skipif(
    not native_available(), reason="native library not built"
)


def test_fallback_seed_matches_oracle():
    r = HostRng(1337, use_native=False)
    s, _ = host_pcg32_init(1337)
    assert r.state == s


@requires_native
def test_native_seed_matches_oracle():
    r = HostRng(1337)
    s, _ = host_pcg32_init(1337)
    assert r.state == s


@requires_native
def test_native_uniform_matches_fallback():
    rn, rf = HostRng(42), HostRng(42, use_native=False)
    np.testing.assert_array_equal(rn.uniform(1000), rf.uniform(1000))
    # the host state advances by n after each batch (random.h:64-66):
    # subsequent batches must stay in lockstep
    np.testing.assert_array_equal(rn.uniform(517), rf.uniform(517))
    assert rn.state == rf.state


@requires_native
def test_native_logistic_matches_fallback():
    got = HostRng(7).logistic(256, 0.5, 0.1)
    exp = HostRng(7, use_native=False).logistic(256, 0.5, 0.1)
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=1e-6)


def test_uniform_statistics_and_range():
    u = HostRng(3, use_native=False).uniform(4096, -2.0, 3.0)
    assert u.min() >= -2.0 and u.max() < 3.0
    assert abs(u.mean() - 0.5) < 0.1


def test_bilinear_matches_jnp():
    import jax

    from tcnn_tpu.utils.image import sample_image, synthetic_image

    img = synthetic_image(64, 48)
    xy = HostRng(3, use_native=False).uniform(2 * 333).reshape(-1, 2)
    got = sample_image_bilinear(img, xy)
    exp = np.asarray(sample_image(img, xy))
    np.testing.assert_allclose(got, exp, atol=1e-5)


@requires_native
def test_fused_image_batch():
    from tcnn_tpu.utils.image import synthetic_image

    img = np.ascontiguousarray(synthetic_image(32, 32))
    xy1, rgb1 = HostRng(1337).image_batch(img, 2048)
    xy2, rgb2 = HostRng(1337, use_native=False).image_batch(img, 2048)
    np.testing.assert_array_equal(xy1, xy2)
    np.testing.assert_allclose(rgb1, rgb2, atol=1e-5)


def test_next_uint_sequence():
    # first draws from the canonical seed must match the oracle step-by-step
    r = HostRng(1337, use_native=False)
    from tcnn_tpu.ops.pcg32 import _host_next, host_pcg32_init

    state, inc = host_pcg32_init(1337)
    for _ in range(5):
        state, exp = _host_next(state, inc)
        assert r.next_uint() == exp
