"""Loss parity tests: values and (custom) gradients vs the reference kernels'
formulas (losses/*.h), including padding-column zeroing and data_pdf."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.registry import create_loss

B, DIMS, STRIDE = 8, 3, 16


def _data(seed=0, positive=False):
    rng = np.random.default_rng(seed)
    pred = rng.normal(size=(B, STRIDE)).astype(np.float32)
    tgt = rng.normal(size=(B, DIMS)).astype(np.float32)
    if positive:
        pred = np.abs(pred) + 0.1
        tgt = np.abs(tgt) + 0.1
    pdf = (rng.uniform(0.5, 2.0, size=(B, DIMS))).astype(np.float32)
    return pred, tgt, pdf


def _grad_of_sum(loss, pred, tgt, pdf):
    f = lambda p: jnp.sum(loss(p, jnp.asarray(tgt), None if pdf is None else jnp.asarray(pdf)))
    return np.asarray(jax.grad(f)(jnp.asarray(pred)))


N = B * DIMS


def test_l2():
    loss = create_loss({"otype": "L2"})
    pred, tgt, pdf = _data()
    v = np.asarray(loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(pdf)))
    d = pred[:, :DIMS] - tgt
    np.testing.assert_allclose(v[:, :DIMS], d * d / pdf / N, rtol=1e-5)
    np.testing.assert_allclose(v[:, DIMS:], 0.0)
    g = _grad_of_sum(loss, pred, tgt, pdf)
    np.testing.assert_allclose(g[:, :DIMS], 2 * d / pdf / N, rtol=1e-5)
    np.testing.assert_allclose(g[:, DIMS:], 0.0)


def test_relative_l2_gradient_treats_normalizer_constant():
    """relative_l2.h:66-75: grad = 2 diff/(p^2+.01)/pdf/n - NOT the true
    derivative of the value (which would have an extra -2 d^2 p/(p^2+.01)^2
    term). This is the reason losses carry custom VJPs."""
    loss = create_loss({"otype": "RelativeL2"})
    pred, tgt, _ = _data(1)
    d = pred[:, :DIMS] - tgt
    denom = pred[:, :DIMS] ** 2 + 0.01
    g = _grad_of_sum(loss, pred, tgt, None)
    np.testing.assert_allclose(g[:, :DIMS], 2 * d / denom / N, rtol=1e-5)


def test_relative_l2_luminance():
    loss = create_loss({"otype": "RelativeL2Luminance"})
    pred, tgt, _ = _data(2)
    lum = 0.299 * pred[:, 0] + 0.587 * pred[:, 1] + 0.114 * pred[:, 2]
    denom = (lum * lum + 0.01)[:, None]
    d = pred[:, :DIMS] - tgt
    v = np.asarray(loss(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(v[:, :DIMS], d * d / denom / N, rtol=1e-5)


@pytest.mark.parametrize(
    "otype,denom_fn",
    [
        ("L1", lambda p, t: np.ones_like(t)),
        ("RelativeL1", lambda p, t: np.abs(p) + 1e-2),
        ("MAPE", lambda p, t: np.abs(t) + 1e-2),
        ("SMAPE", lambda p, t: 0.5 * (np.abs(p) + np.abs(t)) + 1e-2),
    ],
)
def test_l1_family(otype, denom_fn):
    loss = create_loss({"otype": otype})
    pred, tgt, pdf = _data(3)
    p3 = pred[:, :DIMS]
    d = p3 - tgt
    denom = denom_fn(p3, tgt)
    v = np.asarray(loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(pdf)))
    np.testing.assert_allclose(v[:, :DIMS], np.abs(d) / denom / pdf / N, rtol=1e-5)
    g = _grad_of_sum(loss, pred, tgt, pdf)
    np.testing.assert_allclose(
        g[:, :DIMS], np.sign(d) / denom / pdf / N, rtol=1e-5
    )


def test_cross_entropy_and_variance():
    pred, tgt, pdf = _data(4, positive=True)
    ce = create_loss({"otype": "CrossEntropy"})
    v = np.asarray(ce(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(pdf)))
    p3 = pred[:, :DIMS]
    factor = -tgt / pdf / N
    np.testing.assert_allclose(v[:, :DIMS], factor * np.log(p3), rtol=1e-5)
    g = _grad_of_sum(ce, pred, tgt, pdf)
    np.testing.assert_allclose(g[:, :DIMS], factor / p3, rtol=1e-5)

    var = create_loss({"otype": "Variance"})
    v = np.asarray(var(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(pdf)))
    factor = tgt**2 / pdf / N
    np.testing.assert_allclose(
        v[:, :DIMS], factor / p3 - factor / pdf, rtol=1e-5
    )
    g = _grad_of_sum(var, pred, tgt, pdf)
    np.testing.assert_allclose(g[:, :DIMS], -factor / p3**2, rtol=1e-5)


def test_default_loss_is_relative_l2():
    # loss.cu:86
    assert create_loss({}).otype == "RelativeL2"


def test_loss_works_under_jit_and_bf16_pred():
    loss = create_loss({"otype": "L2"})
    pred = jnp.ones((B, STRIDE), jnp.bfloat16)
    tgt = jnp.zeros((B, DIMS), jnp.float32)

    @jax.jit
    def f(p):
        return jnp.sum(loss(p, tgt, None))

    v = float(f(pred))
    np.testing.assert_allclose(v, 1.0, rtol=1e-3)
    g = jax.grad(f)(pred)
    assert g.dtype == jnp.bfloat16
