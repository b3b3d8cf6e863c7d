"""Pallas TPU fully-fused MLP kernels.

TPU-native re-design of kernel_mlp_fused / kernel_mlp_fused_backward
(src/fully_fused_mlp.cu:150-632). The reference pins layer weights in wmma
fragments and walks 128-row batch chunks per threadblock; here each grid step
owns a batch tile, all layer weights live in VMEM for the whole kernel, and
the layer chain runs matmul -> activation entirely in VMEM on the MXU:

  - activations stay in the natural [Nt, width] layout; weights are passed
    PRE-TRANSPOSED [fan_in, fan_out] so every matmul in both directions is a
    plain lane-contraction (in-kernel transposes of large tiles are
    catastrophically slow in Mosaic - measured 10-100x regressions);
  - forward never spills hidden activations (the reference's inference mode);
  - backward RECOMPUTES the forward chain in VMEM (cheaper than an HBM
    round-trip for these tiny layers - replacing the reference's
    out_intermediate buffer), runs the dgrad chain with activation-transfer
    from post-activation values, and accumulates per-layer weight gradients
    across batch tiles in VMEM-resident outputs (the analog of the
    reference's split-k wgrad GEMMs, fully_fused_mlp.cu:775-828);
  - Sine activation falls back to the XLA path - the reference's fused
    kernel rejects it too (fully_fused_mlp.cu:681-705 has no Sine case).

The public entry is `fused_mlp_apply(mlp, params, x)`, differentiable once
via custom_vjp (input gradients ARE produced - the MLP sits above the
encoding, so its dL/dinput feeds the encoding backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import Activation
from ..activations import activation_bwd_out, activation_fn

DEFAULT_BATCH_TILE = 2048
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _supported(mlp) -> bool:
    return (
        Activation.Sine not in (mlp.activation, mlp.output_activation)
        and mlp.n_hidden_layers >= 1
    )


def _forward_chain(mlp, x_bf16, wts, keep_hidden: bool):
    """Shared matmul->activation chain. wts are [fan_in, fan_out] bf16 refs."""
    hs = [x_bf16]
    h = x_bf16
    n_w = len(wts)
    for i in range(n_w):
        z = jnp.dot(h, wts[i][:], preferred_element_type=jnp.float32)
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        h = activation_fn(z, act).astype(jnp.bfloat16)
        if keep_hidden:
            hs.append(h)
    return h, hs


def _fwd_kernel(x_ref, *ws_and_out, mlp):
    wts, y_ref = ws_and_out[:-1], ws_and_out[-1]
    h, _ = _forward_chain(mlp, x_ref[:].astype(jnp.bfloat16), wts, False)
    y_ref[:] = h.astype(y_ref.dtype)


def _bwd_kernel(x_ref, gy_ref, *refs, mlp):
    n_w = mlp.n_hidden_layers + 1
    wts = refs[:n_w]
    gwt_refs = refs[n_w : 2 * n_w]
    gx_ref = refs[2 * n_w]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gw in gwt_refs:
            gw[:] = jnp.zeros_like(gw)

    x_bf16 = x_ref[:].astype(jnp.bfloat16)
    _, hs = _forward_chain(mlp, x_bf16, wts, True)

    # dgrad chain with activation transfer from outputs
    # (kernel_mlp_fused_backward, fully_fused_mlp.cu:150-259)
    g = gy_ref[:].astype(jnp.float32)  # [Nt, out_pad]
    for i in reversed(range(n_w)):
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        g = activation_bwd_out(g, hs[i + 1].astype(jnp.float32), act)
        gb = g.astype(jnp.bfloat16)
        # wgrad (transposed layout): dL/dWt[in, out] = sum_n h[n, in] g[n, out]
        gwt_refs[i][:] = gwt_refs[i][:] + jax.lax.dot_general(
            hs[i],
            gb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dgrad: g @ W = g @ Wt^T  ([Nt, out] x [in, out] contracted on out)
        g = jax.lax.dot_general(
            gb,
            wts[i][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    gx_ref[:] = g.astype(gx_ref.dtype)


def _split_weights_t(mlp, params):
    """flat fp32 -> list of TRANSPOSED bf16 weights [fan_in, fan_out]."""
    mats = []
    off = 0
    for r, c in mlp.layer_sizes():
        mats.append(params[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16))
        off += r * c
    return mats


def _fwd_call(mlp, wts, x, nt):
    b = x.shape[0]
    out_w = mlp.padded_output_width
    w_specs = [
        pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for w in wts
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, mlp=mlp),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ]
        + w_specs,
        out_specs=pl.BlockSpec(
            (nt, out_w), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_w), jnp.bfloat16),
        compiler_params=_VMEM_LIMIT,
    )(x, *wts)


def _bwd_call(mlp, wts, x, gy, nt):
    b = x.shape[0]
    w_specs = [
        pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for w in wts
    ]
    gw_specs = [
        pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for w in wts
    ]
    gw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, mlp=mlp),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nt, gy.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ]
        + w_specs,
        out_specs=gw_specs
        + [
            pl.BlockSpec(
                (nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM
            )
        ],
        out_shape=gw_shapes
        + [jax.ShapeDtypeStruct((b, x.shape[1]), jnp.bfloat16)],
        compiler_params=_VMEM_LIMIT,
    )(x, gy, *wts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp(mlp, params, x):
    wts = _split_weights_t(mlp, params)
    return _fwd_call(mlp, wts, x, DEFAULT_BATCH_TILE)


def _fused_mlp_fwd(mlp, params, x):
    return _fused_mlp(mlp, params, x), (params, x)


def _fused_mlp_bwd(mlp, res, gy):
    params, x = res
    wts = _split_weights_t(mlp, params)
    *gwts, gx = _bwd_call(mlp, wts, x, gy.astype(jnp.bfloat16), DEFAULT_BATCH_TILE)
    gparams = jnp.concatenate([g.T.reshape(-1) for g in gwts])
    return gparams.astype(params.dtype), gx.astype(x.dtype)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_apply(mlp, params, x, *, compute_dtype=jnp.bfloat16):
    if not _supported(mlp):
        raise NotImplementedError("fused MLP kernel: unsupported activation")
    b = x.shape[0]
    nt = DEFAULT_BATCH_TILE
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    y = _fused_mlp(mlp, params.astype(jnp.float32), x.astype(jnp.bfloat16))
    return y[:b].astype(compute_dtype)
