"""Dense externally-indexed table lookup (gather/scatter) Pallas kernels.

The binned kernels (binned_kernel.py) serve HUGE tables (>= 2^14 rows)
by sorting picks into row-window bins; their cost scales with picks and
carries the binning pipeline's fixed overhead. This module serves the
opposite regime: MANY SMALL dense tables that fit VMEM together, indexed
by caller-computed rows - the one-hot-matmul gather of grid_kernel.py
with the index math stripped out.

Built for PPNG2 (36 plane tables of Q^2=4096 rows x 16 features - the
round-5 einsum formulation measured 8.6 s/step at b=2^17 on v5e because
its [.., C, Q, R] intermediates have tiny trailing dims the TPU (sublane,
lane) tiling pads 32x), but generic: any (n_levels, t_rows, f) with
t_rows % (128 // f) == 0 and the packed tables within the VMEM budget.

Layout (the "f-on-lanes" variant of the grid kernels' packing): a level's
table [t_rows, F] packs as [h, 128] with h = t_rows // LQ, LQ = 128 // F,
lane = (row % LQ) * F + f, sublane-row = row // LQ. The gather matmul
(one-hot [h, C*nt] against the level block) then yields gT [128, C*nt]
whose 128 lanes-of-candidates hold ALL F features of LQ candidate rows -
one [128, C*nt] mask-multiply + an LQ-slab reduction extracts every
feature in a single pass over gT (the grid kernels' per-feature pick
would pay F passes).

Differentiation: `dense_ext_gather` and `dense_ext_scatter` are each
other's vjp (gather^T = scatter), so gradients compose to ARBITRARY
order; row indices are piecewise-constant (zero cotangent), matching
binned_ext_lookup's contract. Interpolation weights stay OUTSIDE (plain
jnp - autodiff handles them), unlike binned_ext_lookup's fused cw:
callers like PPNG2 combine gathered corners nonlinearly (products of
three planes, ppng_2.h:32-72), so raw per-corner values are the right
primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import grid_kernel as gk

LANE = 128

#: batch tile (samples per kernel instance); C*NT lanes per operand
#: block. Swept on v5e (train step b=2^17, round 5): PPNG3 Q=64
#: 300/295/292 ms and PPNG2 62.5/64.7/65.0 ms at NT=256/512/1024 -
#: within noise, 512 stays.
NT = 512
#: VMEM budget for the packed tables (bf16) - beyond it, callers fall
#: back (PPNG2 -> einsum path; others -> their own fallback)
TABLE_BUDGET = 48 * 1024 * 1024


def _lq(t_rows: int, f: int) -> int:
    """Effective rows-per-lane-group: tables smaller than a full lane
    group (t_rows < 128/F) pack into the low lanes and the rest pad."""
    return min(LANE // f, t_rows)


def supported(n_levels: int, t_rows: int, f: int) -> bool:
    """Whether (n_levels, t_rows, f) fits this kernel's layout + VMEM."""
    if f not in (1, 2, 4, 8, 16, 32, 64, 128):
        return False
    if t_rows % _lq(t_rows, f) != 0:
        return False
    if n_levels * t_rows * f * 2 > TABLE_BUDGET:
        return False
    return True


def pack_tables(n_levels: int, t_rows: int, f: int, flat):
    """[NL * t_rows * F] flat (level-major, row-major, f-minor) ->
    packed [NL * h, 128] bf16 with lane = (row % LQ) * F + f (lanes
    beyond LQ*F zero-padded when the table is narrower than a group)."""
    lq = _lq(t_rows, f)
    h = t_rows // lq
    t = flat.reshape(n_levels * h, lq * f)  # lane = (row%LQ)*F + f already
    if lq * f < LANE:
        t = jnp.pad(t, ((0, 0), (0, LANE - lq * f)))
    return t.astype(jnp.bfloat16)


def unpack_table_grads(n_levels: int, t_rows: int, f: int, packed):
    """Inverse of pack_tables for the f32 gradient table."""
    lq = _lq(t_rows, f)
    if lq * f < LANE:
        packed = packed[:, : lq * f]
    return packed.reshape(n_levels * t_rows * f)


def _gather_kernel(idxT_ref, table_ref, out_ref, *, levels, f, lq):
    """One batch tile: idxT [NL, C*nt] i32 -> out [NL*F, C*nt] bf16."""
    idxT = idxT_ref[:]
    cnt = idxT.shape[1]
    hiT = idxT // lq
    loT = idxT % lq
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0) // f

    def _mask(l):
        # mask[j, col] = (j // F == lo(l, col)): selects the LQ-slab of
        # lane candidates holding col's row; all F features pass at once
        return jnp.broadcast_to(loT[l : l + 1, :], (LANE, cnt)) == iota_f

    def _build(l, off, h):
        hr = jnp.broadcast_to(hiT[l : l + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    rows = []
    built = {0: _build(0, *levels[0])}
    for l, (off, h) in enumerate(levels):
        if l + 1 < len(levels):
            built[l + 1] = _build(l + 1, *levels[l + 1])
        ohT = built.pop(l)
        gT = jax.lax.dot_general(
            table_ref[off : off + h, :], ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128, C*nt]: LQ candidate rows x F features on sublanes
        gm = jnp.where(_mask(l), gT, 0.0)
        # LQ-slab reduction: one pass over gT extracts all F features
        picked = gm[:f, :]
        for s in range(1, lq):
            picked = picked + gm[s * f : (s + 1) * f, :]
        rows.append(picked)  # [F, C*nt]
    out_ref[:] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def _scatter_kernel(idxT_ref, ctT_ref, gtable_ref, *, levels, f, lq):
    """One batch tile: ct [NL*F, C*nt] f32 scattered into the packed
    gradient table [NL*h, 128] f32 (accumulated across tiles)."""
    idxT = idxT_ref[:]
    cnt = idxT.shape[1]
    hiT = idxT // lq
    loT = idxT % lq
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0) // f

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    def _mask(l):
        return jnp.broadcast_to(loT[l : l + 1, :], (LANE, cnt)) == iota_f

    def _build(l, off, h):
        hr = jnp.broadcast_to(hiT[l : l + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    def _rhs(l):
        # [128, C*nt]: the level's ct block [F, C*nt] tiled LQ times over
        # sublanes (row j carries feature j % F), masked to the pick slab
        ct_l = ctT_ref[l * f : (l + 1) * f, :]
        tiled = jnp.concatenate([ct_l] * (LANE // f), axis=0)
        return jnp.where(_mask(l), tiled, 0.0).astype(jnp.bfloat16)

    pend = {0: (_build(0, *levels[0]), _rhs(0))}
    for l, (off, h) in enumerate(levels):
        if l + 1 < len(levels):
            pend[l + 1] = (_build(l + 1, *levels[l + 1]), _rhs(l + 1))
        ohT, rhsT = pend.pop(l)
        contrib = jax.lax.dot_general(
            ohT, rhsT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [h, 128]
        gtable_ref[off : off + h, :] = gtable_ref[off : off + h, :] + contrib


def _levels(n_levels: int, t_rows: int, f: int):
    h = t_rows // _lq(t_rows, f)
    return tuple((l * h, h) for l in range(n_levels))


def _idxT(n_levels: int, c: int, idx):
    """idx [B, C*NL] f32 (col c*NL + l) -> [NL, C*B] i32 (corner-blocks
    on lanes, vt layout)."""
    b = idx.shape[0]
    t = idx.astype(jnp.int32).reshape(b, c, n_levels)
    return t.transpose(2, 1, 0).reshape(n_levels, c * b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def dense_ext_gather(n_levels, t_rows, f, c, table_flat, idx):
    """Raw per-pick features from NL dense VMEM-resident tables.

    table_flat: [NL * t_rows * F] f32/bf16, level-major row-major f-minor
    (the same index order as `idx`). idx: [B, C*NL] f32 level-local rows
    (col c*NL + l, binned_ext_lookup's layout). Returns picks
    [B, C*NL*F] bf16 (col (c*NL + l)*F + f). Differentiable in
    table_flat to arbitrary order (gather^T = scatter); idx gets zeros.
    """
    return _gather(n_levels, t_rows, f, c, table_flat, idx)


def _gather(n_levels, t_rows, f, c, table_flat, idx):
    b = idx.shape[0]
    padded = -(-b // NT) * NT
    if padded != b:
        idx = jnp.pad(idx, ((0, padded - b), (0, 0)))
    idxT = _idxT(n_levels, c, idx)  # [NL, C*padded]
    packed = pack_tables(n_levels, t_rows, f, table_flat)
    levels = _levels(n_levels, t_rows, f)
    cnt = c * NT
    kern = functools.partial(_gather_kernel, levels=levels, f=f,
                         lq=_lq(t_rows, f))
    out = pl.pallas_call(
        kern,
        grid=(padded // NT,),
        in_specs=[
            pl.BlockSpec((n_levels, cnt), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_levels * f, cnt), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_levels * f, c * padded), jnp.bfloat16
        ),
        compiler_params=gk._VMEM_LIMIT,
    )(idxT, packed)
    # [NL*F, C*B] -> [B, C*NL*F]
    out = out.reshape(n_levels * f, c, padded).transpose(2, 1, 0)
    return out.reshape(padded, c * n_levels * f)[:b]


def _gather_fwd(n_levels, t_rows, f, c, table_flat, idx):
    return _gather(n_levels, t_rows, f, c, table_flat, idx), idx


def _gather_bwd(n_levels, t_rows, f, c, idx, ct):
    gtable = dense_ext_scatter(n_levels, t_rows, f, c, idx,
                               ct.astype(jnp.float32))
    return gtable, jnp.zeros_like(idx)


dense_ext_gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def dense_ext_scatter(n_levels, t_rows, f, c, idx, ct):
    """Transpose of dense_ext_gather: per-pick cotangents ct
    [B, C*NL*F] f32 accumulate into flat table gradients
    [NL * t_rows * F] f32 (deterministic matmul scatter)."""
    return _scatter(n_levels, t_rows, f, c, idx, ct)


def _scatter(n_levels, t_rows, f, c, idx, ct):
    b = idx.shape[0]
    padded = -(-b // NT) * NT
    if padded != b:
        idx = jnp.pad(idx, ((0, padded - b), (0, 0)))
        ct = jnp.pad(ct, ((0, padded - b), (0, 0)))
    idxT = _idxT(n_levels, c, idx)
    # [B, C*NL*F] -> [NL*F, C*B]
    ctT = ct.reshape(padded, c, n_levels * f).transpose(2, 1, 0)
    ctT = ctT.reshape(n_levels * f, c * padded).astype(jnp.float32)
    levels = _levels(n_levels, t_rows, f)
    h = t_rows // _lq(t_rows, f)
    cnt = c * NT
    kern = functools.partial(_scatter_kernel, levels=levels, f=f,
                         lq=_lq(t_rows, f))
    gtable = pl.pallas_call(
        kern,
        grid=(padded // NT,),
        in_specs=[
            pl.BlockSpec((n_levels, cnt), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels * f, cnt), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_levels * h, LANE), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_levels * h, LANE), jnp.float32),
        compiler_params=gk._VMEM_LIMIT,
    )(idxT, ctT)
    return unpack_table_grads(n_levels, t_rows, f, gtable)


def _scatter_fwd(n_levels, t_rows, f, c, idx, ct):
    return _scatter(n_levels, t_rows, f, c, idx, ct), idx


def _scatter_bwd(n_levels, t_rows, f, c, idx, g_gtable):
    g_ct = dense_ext_gather(n_levels, t_rows, f, c,
                            g_gtable.astype(jnp.float32), idx)
    return jnp.zeros_like(idx), g_ct.astype(jnp.float32)


dense_ext_scatter.defvjp(_scatter_fwd, _scatter_bwd)
