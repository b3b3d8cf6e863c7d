"""Losses.

Mirror of the reference's Loss<T>::evaluate protocol (loss.h:38-61) and the
elementwise kernels in losses/*.h. Each loss maps
    prediction [B, stride], target [B, dims], optional data_pdf [B, dims]
to
    values [B, stride] fp32   (zero on padded columns, normalized by
                               n_total = B * dims)
and defines d(loss)/d(prediction) *by specification*, not by true
differentiation: several reference losses deliberately treat their
normalizer as a constant (e.g. RelativeL2's 1/(p^2+0.01), relative_l2.h:66-75)
so autodiff of the value would give the wrong training gradient. We therefore
wrap each loss in `jax.custom_vjp` whose backward returns exactly the
reference's gradient formula (times the upstream cotangent).

The loss_scale of the reference (multiplied into gradients in the kernel,
l2.h:74, divided out in the optimizer, adam.h:75) is applied by the Trainer
as a multiplier on the summed loss value - equivalent and simpler.

Formulas (file:line in /root/reference/include/tiny-cuda-nn/losses/):
  L2                  (p-t)^2 / pdf / n            grad 2(p-t)/pdf/n       l2.h:66-75
  RelativeL2          (p-t)^2/(p^2+.01)/pdf/n      grad 2(p-t)/(p^2+.01)/pdf/n   relative_l2.h:66-75
  RelativeL2Luminance as RelativeL2 but normalized by luminance
                      (.299r+.587g+.114b of the sample's first 3 prediction
                      channels)^2+.01               relative_l2_luminance.h:76-86
  L1                  |p-t|/pdf/n                  grad sign(p-t)/pdf/n    l1.h:69-75
  RelativeL1          |p-t|/(|p|+.01)/pdf/n        grad sign/(|p|+.01)/pdf/n    relative_l1.h:69-76
  MAPE                |p-t|/(|t|+.01)/pdf/n        mape.h:70-77
  SMAPE               |p-t|/(.5(|p|+|t|)+.01)/pdf/n  smape.h:70-77
  CrossEntropy        -t log(p)/pdf/n              grad -t/p/pdf/n         cross_entropy.h:55-75
  Variance            t^2/pdf/n * (1/p - 1/pdf)    grad -t^2/pdf/n /p^2    variance_is.h:40-77
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Loss:
    """A named elementwise loss with reference-exact value and gradient."""

    otype = "Loss"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        """Return (values, grad) both [B, stride] fp32 (pre-loss-scale).

        dims_axis: which axis carries the output dims (1 = the public
        [B, stride] layout; 0 = the transposed [stride, B] layout used by
        the Pallas vt train kernel, where samples live on the lane dim).
        The math is elementwise, so the two layouts share the formulas."""
        raise NotImplementedError

    def __call__(self, prediction, target, pdf=None):
        """values [B, stride] fp32, with the reference-specified custom vjp
        w.r.t. `prediction` (no gradients flow to target/pdf, matching the
        reference, which only emits dL_dprediction)."""
        if pdf is None:
            pdf = jnp.ones_like(target)
        return _loss_values(self, prediction, target, pdf)

    def hyperparams(self):
        return {"otype": self.otype}

    def update_hyperparams(self, params: dict) -> None:
        pass

    # -- shared plumbing ----------------------------------------------------
    @staticmethod
    def _prepare(prediction, target, pdf, axis=1):
        dims = target.shape[axis]
        n_total = target.size  # b * dims, layout-independent
        pred = (
            prediction[:, :dims] if axis == 1 else prediction[:dims, :]
        ).astype(jnp.float32)
        pdf = jnp.ones_like(target) if pdf is None else pdf
        return pred, target.astype(jnp.float32), pdf.astype(jnp.float32), n_total

    @staticmethod
    def _pad(arr, stride, axis=1):
        dims = arr.shape[axis]
        if stride > dims:
            pad = (0, stride - dims)
            arr = jnp.pad(arr, ((0, 0), pad) if axis == 1 else (pad, (0, 0)))
        return arr


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _loss_values(loss, prediction, target, pdf):
    values, _ = loss.value_and_grad_fn(prediction, target, pdf)
    return values


def _loss_values_fwd(loss, prediction, target, pdf):
    values, grad = loss.value_and_grad_fn(prediction, target, pdf)
    grad = grad.astype(prediction.dtype)
    return values, (grad, target, pdf)


def _loss_values_bwd(loss, res, g):
    grad, target, pdf = res
    return (g * grad).astype(grad.dtype), jnp.zeros_like(target), jnp.zeros_like(pdf)


_loss_values.defvjp(_loss_values_fwd, _loss_values_bwd)


class L2Loss(Loss):
    otype = "L2"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        values = diff * diff / pdf / n
        grad = 2.0 * diff / pdf / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class RelativeL2Loss(Loss):
    otype = "RelativeL2"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        denom = pred * pred + 0.01
        values = diff * diff / denom / pdf / n
        grad = 2.0 * diff / denom / pdf / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class RelativeL2LuminanceLoss(Loss):
    """Normalized by luminance of the prediction's first 3 (RGB) channels.

    relative_l2_luminance.h:70-86: every channel of a sample shares the same
    luminance normalizer.
    """

    otype = "RelativeL2Luminance"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        ch = (lambda i: pred[:, i]) if dims_axis == 1 else (lambda i: pred[i, :])
        lum = 0.299 * ch(0) + 0.587 * ch(1) + 0.114 * ch(2)
        lum = lum[:, None] if dims_axis == 1 else lum[None, :]
        denom = lum * lum + 0.01
        diff = pred - tgt
        values = diff * diff / denom / pdf / n
        grad = 2.0 * diff / denom / pdf / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class L1Loss(Loss):
    otype = "L1"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        values = jnp.abs(diff) / pdf / n
        grad = jnp.sign(diff) / pdf / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class RelativeL1Loss(Loss):
    otype = "RelativeL1"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        scale = 1.0 / (jnp.abs(pred) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n
        grad = jnp.sign(diff) * scale / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class MapeLoss(Loss):
    otype = "MAPE"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        scale = 1.0 / (jnp.abs(tgt) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n
        grad = jnp.sign(diff) * scale / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class SmapeLoss(Loss):
    otype = "SMAPE"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        diff = pred - tgt
        scale = 1.0 / (0.5 * (jnp.abs(tgt) + jnp.abs(pred)) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n
        grad = jnp.sign(diff) * scale / n
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class CrossEntropyLoss(Loss):
    otype = "CrossEntropy"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        factor = -tgt / pdf / n
        values = factor * jnp.log(pred)
        grad = factor / pred  # cross_entropy.h:73 (factor already carries /n)
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class VarianceIsLoss(Loss):
    otype = "Variance"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        pred, tgt, pdf, n = self._prepare(prediction, target, pdf, dims_axis)
        factor = tgt * tgt / pdf / n
        values = factor / pred - factor / pdf
        grad = -factor / (pred * pred)
        s = prediction.shape[dims_axis]
        return (self._pad(values, s, dims_axis),
                self._pad(grad, s, dims_axis))


class ConstantLoss(Loss):
    """Zero loss helper (losses/constant.h; unregistered in the reference)."""

    otype = "Constant"

    def value_and_grad_fn(self, prediction, target, pdf, dims_axis=1):
        z = jnp.zeros(prediction.shape, dtype=jnp.float32)
        return z, z
