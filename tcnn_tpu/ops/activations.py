"""Activation functions with reference-exact semantics.

Matches the forward/backward forms of warp_activation / warp_activation_backward
/ warp_activation_backward_in (reference common_device.h:102-304), including the
K_ACT=10 "zoom" of Squareplus/Softplus and the 0.01 LeakyReLU slope.

All functions are plain jnp - differentiable to arbitrary order, fusable by
XLA, and usable inside Pallas kernels (they lower to VPU ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import Activation, K_ACT


def activation_fn(x, act: Activation):
    """Forward activation (common_device.h:102-165)."""
    if act == Activation.NONE:
        return x
    if act == Activation.ReLU:
        return jnp.maximum(x, 0)
    if act == Activation.LeakyReLU:
        return jnp.where(x > 0, x, 0.01 * x)
    if act == Activation.Exponential:
        return jnp.exp(x)
    if act == Activation.Sine:
        return jnp.sin(x)
    if act == Activation.Sigmoid:
        return jax.nn.sigmoid(x)
    if act == Activation.Squareplus:
        # X = x*K; 0.5*(X + sqrt(X^2+4))/K
        xk = x * K_ACT
        return 0.5 * (xk + jnp.sqrt(xk * xk + 4.0)) / K_ACT
    if act == Activation.Softplus:
        # log(exp(x*K)+1)/K, numerically stabilized
        return jax.nn.softplus(x * K_ACT) / K_ACT
    if act == Activation.Tanh:
        return jnp.tanh(x)
    raise ValueError(f"Unsupported activation {act}")


def activation_bwd_in(grad, pre_act, act: Activation):
    """grad * act'(pre_act) given the *pre-activation* input.

    Mirror of warp_activation_backward_in (common_device.h:169-233).
    """
    if act == Activation.NONE:
        return grad
    if act == Activation.ReLU:
        return grad * (pre_act > 0)
    if act == Activation.LeakyReLU:
        return grad * jnp.where(pre_act > 0, 1.0, 0.01)
    if act == Activation.Exponential:
        return grad * jnp.exp(pre_act)
    if act == Activation.Sine:
        return grad * jnp.cos(pre_act)
    if act == Activation.Sigmoid:
        s = jax.nn.sigmoid(pre_act)
        return grad * s * (1.0 - s)
    if act == Activation.Squareplus:
        y = activation_fn(pre_act, Activation.Squareplus) * K_ACT
        y2 = y * y
        return grad * (y2 / (y2 + 1.0))
    if act == Activation.Softplus:
        tmp = jnp.exp(pre_act * K_ACT)
        return grad * (tmp / (tmp + 1.0))
    if act == Activation.Tanh:
        t = jnp.tanh(pre_act)
        return grad * (1.0 - t * t)
    raise ValueError(f"Unsupported activation {act}")


def activation_bwd_out(grad, post_act, act: Activation):
    """grad * act'(x) expressed via the *post-activation* output.

    Mirror of warp_activation_backward (common_device.h:237-304); this is the
    form fused kernels use since they only keep the activated value. Only
    invertible-enough activations support it (the reference asserts the same
    - Sine is excluded there too, cutlass_mlp.cu:101-113).
    """
    if act == Activation.NONE:
        return grad
    if act == Activation.ReLU:
        return grad * (post_act > 0)
    if act == Activation.LeakyReLU:
        return grad * jnp.where(post_act > 0, 1.0, 0.01)
    if act == Activation.Exponential:
        return grad * post_act
    if act == Activation.Sigmoid:
        return grad * post_act * (1.0 - post_act)
    if act == Activation.Squareplus:
        y = post_act * K_ACT
        y2 = y * y
        return grad * (y2 / (y2 + 1.0))
    if act == Activation.Softplus:
        return grad * (1.0 - jnp.exp(-post_act * K_ACT))
    if act == Activation.Tanh:
        return grad * (1.0 - post_act * post_act)
    raise ValueError(
        f"Activation {act} cannot be differentiated from its output alone"
    )


#: Activations whose derivative is computable from the forward output
#: (everything except Sine; see cutlass_mlp.cu:101-113).
OUTPUT_INVERTIBLE = frozenset(
    a for a in Activation if a != Activation.Sine
)
