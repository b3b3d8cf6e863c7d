"""Pallas TPU kernels for the multiresolution grid encoding.

TPU-native re-design of kernel_grid / kernel_grid_backward
(/root/reference/include/tiny-cuda-nn/encodings/grid.h:48-320). The CUDA
kernels are one-thread-per-sample random-access programs served by the GPU's
L2 cache; the TPU has no per-lane random access into large buffers (Mosaic's
dynamic gather covers a single 128-lane vreg), so both directions are
reformulated as *matmuls against on-the-fly one-hot matrices*, which the MXU
executes at full rate and which are exactly reproducible (deterministic -
unlike the reference's atomicAdd races, vec.h:300-347):

  forward   y[n]      = onehot_hi[n, :] @ table_block[:, :]   then a 128-lane
                        pick of lo = idx & 127
  backward  dL/dtable = onehot_hi^T @ (onehot_lo * w * dL/dy)

with idx split as idx = hi*128 + lo. Measured on TPU v5e: XLA's native
gather runs at 0.2 G rows/s and scatter-add at 16 M upd/s - both orders of
magnitude short of the 16.7M gathers/step this encoding needs - while the
one-hot matmul turns the problem into dense MXU work.

Layout and scheduling choices (v2, measured):
  - tables are packed per level at their EXACT 128-row-block count
    [H_l, 128*F] (features side by side in lanes), concatenated into one
    [H_total, 128*F] VMEM-resident buffer - no padding to a common max;
  - per level, all 2^D corners are stacked along the matmul M dimension:
    ONE [C*Nt, H_l] @ [H_l, 128*F] matmul per level serves every corner and
    every feature (bigger matmuls, fewer ops, ~4x fewer Mosaic instructions
    than the per-corner-per-feature formulation);
  - index math is lane-oriented: positions/cells/fractions for ALL levels
    are computed in [Nt, D*L] arrays (levels and dims in lanes), so the
    VPU processes 128 samples per op instead of 1 (the naive [Nt, 1]
    formulation wastes 127/128 lanes);
  - the backward kernel accumulates dL/dtable in VMEM across batch tiles
    (the analog of the reference's single-pass atomicAdd accumulation) and
    produces table gradients only; dL/dx uses the XLA path (the composed
    model never needs it when the encoding is the first layer - same
    optimization as prepare_input_gradients=false,
    network_with_input_encoding.h:70-81).

Index math matches grid_index (common_device.h:690-707): hashed levels are
always power-of-two so the modulo is a bit-mask (correct in int32 for any
wrapped hash value); dense/tiled levels use exact float32 modulo, guarded by
plan_for to indices < 2^24 (falls back to the XLA path beyond).

Supported (plan_for returns None otherwise, falling back to the jnp oracle):
Linear/Smoothstep/Nearest interpolation, Prime/CoherentPrime/ReversedPrime
hashes, 2-4 input dims, any n_features_per_level, packed table <= 24 MB.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import GridType, HashType, InterpolationType, smoothstep

LANE = 128
MAX_PACKED_TABLE_BYTES = 24 * 1024 * 1024
#: the one-hot matmul formulation costs O(batch x total_table_rows) MXU
#: work; beyond ~1.5M rows (e.g. L16/T=2^15 config_hash is 0.35M;
#: L16/T=2^16 is ~1.05M) it loses to any per-sample-cost path and Mosaic
#: compile times blow up - fall back to the XLA oracle there.
MAX_TABLE_ROWS = 1_500_000
MAX_DENSE_INDEX = 1 << 24  # float32-exact integer range guard


@dataclasses.dataclass(frozen=True)
class _Level:
    scale: float
    size: int
    h: int  # number of 128-row blocks (exact, per level)
    row_off: int  # block-row offset into the packed table
    use_hash: bool
    pow2: bool
    strides: tuple  # uint32-wrapped dense strides per dim
    alive: tuple  # whether dim d contributes to the dense index


@dataclasses.dataclass(frozen=True)
class GridKernelPlan:
    d: int
    n_levels: int
    f: int
    h_total: int
    levels: tuple
    hash_factors: tuple
    interpolation: InterpolationType
    offsets: tuple  # per-level feature-row offset into the flat param vector
    batch_tile: int
    #: single-randomly-chosen-corner gradient scatter (grid.h:284-299);
    #: the backward runs M=Nt matmuls instead of M=C*Nt - 2^D x cheaper
    stochastic: bool = False
    #: HashType.Rng: the 64-step PCG32-advance hash (common_device.h:663-677)
    #: is computed OUTSIDE the kernel (vectorized 16-bit-limb emulation in
    #: ops/pcg32.py - elementwise, so XLA handles it fine; only the
    #: gather/scatter needed Pallas) and passed in as a [Nt, C*L] input
    ext_hash: bool = False

    @property
    def out_width(self):
        return self.n_levels * self.f

    @property
    def n_corners(self):
        if self.interpolation == InterpolationType.Nearest:
            return 1
        return 1 << self.d


def plan_for(enc) -> GridKernelPlan | None:
    """Build a kernel plan for a GridEncoding, or None if unsupported."""
    plan = build_plan(enc, 0, enc.n_levels)
    if plan is None:
        return None
    packed_bytes = plan.h_total * LANE * plan.f * 2
    if packed_bytes > MAX_PACKED_TABLE_BYTES:
        return None
    if plan.h_total * LANE > MAX_TABLE_ROWS:
        return None
    return plan


def build_plan(enc, lvl_lo: int, lvl_hi: int) -> GridKernelPlan | None:
    """Kernel plan covering levels [lvl_lo, lvl_hi) of a GridEncoding with
    LOCAL parameter offsets (for use on a slice of the param vector).
    Applies per-level support checks only - size caps are the caller's
    concern (plan_for enforces the dense-kernel VMEM caps; the binned path
    has its own limits)."""
    ext_hash = enc.hash_type == HashType.Rng
    if enc.n_dims_to_encode not in (2, 3, 4):
        return None
    if lvl_hi <= lvl_lo:
        return None
    stochastic = bool(enc.stochastic_interpolation) and (
        enc.interpolation != InterpolationType.Nearest
    )

    from ..encodings.grid import _hash_factors

    levels = []
    h_total = 0
    for lvl in range(lvl_lo, lvl_hi):
        size = int(enc._sizes[lvl])
        res = int(enc._resolutions[lvl])
        scale = float(enc._scales[lvl])
        # replicate the stride loop (common_device.h:690-703) statically
        stride = 1
        strides, alive = [], []
        for _ in range(enc.n_dims_to_encode):
            a = stride <= size
            alive.append(a)
            strides.append(stride if a else 0)
            if a:
                stride = (stride * res) & 0xFFFFFFFF
        use_hash = enc.grid_type == GridType.Hash and size < stride
        pow2 = (size & (size - 1)) == 0
        if not use_hash and not pow2:
            # float32 modulo must be exact: bound the max dense index
            max_cell = res + 2
            max_index = sum(s * max_cell for s in strides)
            if max_index >= MAX_DENSE_INDEX:
                return None
        h = -(-size // LANE)
        levels.append(
            _Level(
                scale, size, h, h_total, use_hash, pow2, tuple(strides),
                tuple(alive),
            )
        )
        h_total += h

    base = int(enc._offsets[lvl_lo])
    return GridKernelPlan(
        d=enc.n_dims_to_encode,
        n_levels=lvl_hi - lvl_lo,
        f=enc.n_features_per_level,
        h_total=h_total,
        levels=tuple(levels),
        hash_factors=(
            (0,) * enc.n_dims_to_encode
            if ext_hash
            else tuple(
                int(v)
                for v in _hash_factors(enc.hash_type, enc.n_dims_to_encode)
            )
        ),
        interpolation=enc.interpolation,
        offsets=tuple(int(o) - base for o in enc._offsets[lvl_lo:lvl_hi]),
        # C*Nt-row intermediates: keep corners*tile <= 8192 rows (VMEM)
        batch_tile=1024 if enc.n_dims_to_encode < 4 else 512,
        stochastic=stochastic,
        ext_hash=ext_hash,
    )


# ---------------------------------------------------------------------------
# Table repacking: flat params <-> [H_total, 128*F]
# ---------------------------------------------------------------------------


def _uniform_levels(plan: GridKernelPlan) -> bool:
    """All levels the same 128-aligned size (the binned-suffix case)."""
    s0 = plan.levels[0].size
    return all(
        lvl.size == s0 and lvl.h * LANE == s0 for lvl in plan.levels
    )


def repack_table(plan: GridKernelPlan, params):
    """flat fp32 [n_params] -> bf16 [H_total, 128*F]: row r of level l sits
    at packed[level.row_off + r // 128, r % 128 + f*128] for feature f."""
    F = plan.f
    if _uniform_levels(plan):
        # equal-size levels: ONE reshape+transpose (the per-level
        # pad/concat graph below took XLA ~minutes to compile at 10x2^19)
        nl, h = plan.n_levels, plan.levels[0].h
        t = params.reshape(nl * h, LANE, F)
        return (
            jnp.swapaxes(t, 1, 2).reshape(nl * h, F * LANE)
            .astype(jnp.bfloat16)
        )
    table = params.reshape(-1, F)  # [total_rows, F]
    per_level = []
    for lvl, level in enumerate(plan.levels):
        off = plan.offsets[lvl]
        rows = table[off : off + level.size]  # [size, F]
        rows = jnp.pad(rows, ((0, level.h * LANE - level.size), (0, 0)))
        blocks = rows.reshape(level.h, LANE, F)  # [H, 128, F]
        per_level.append(
            jnp.concatenate([blocks[:, :, f] for f in range(F)], axis=1)
        )  # [H, 128*F]
    return jnp.concatenate(per_level, axis=0).astype(jnp.bfloat16)


def fl_levels(plan: GridKernelPlan):
    """f-on-lanes level geometry: ((row_off, h), ...) per level plus the
    total height of the packed table [fl_h_total, 128] with
    lane = (row % LQ) * F + f, LQ = 128 // F (dense_ext_kernel.py's
    packing). Each level's height is ceil(size / LQ) - F times the
    standard packing's - but the gather's candidate block shrinks to
    [128, C*nt]: half the f32 write+read traffic at F=2, and one mask
    pass picks all F features (see train_kernel.VT_FL)."""
    lq = LANE // plan.f
    out, off = [], 0
    for level in plan.levels:
        h = -(-level.size // lq)
        out.append((off, h))
        off += h
    return tuple(out), off


def repack_table_fl(plan: GridKernelPlan, params):
    """flat fp32 [n_params] -> bf16 [fl_h_total, 128]: row r of level l
    sits at packed[fl_off + r // LQ, (r % LQ) * F + f] for feature f.
    Because the flat layout is already row-major f-minor, the uniform
    case is a PURE reshape (cheaper than repack_table's swapaxes)."""
    F = plan.f
    lq = LANE // F
    if _uniform_levels(plan) and plan.levels[0].size % lq == 0:
        nl = plan.n_levels
        h = plan.levels[0].size // lq
        return params.reshape(nl * h, lq * F).astype(jnp.bfloat16)
    table = params.reshape(-1, F)  # [total_rows, F]
    per_level = []
    for lvl, level in enumerate(plan.levels):
        off = plan.offsets[lvl]
        h = -(-level.size // lq)
        rows = table[off : off + level.size]  # [size, F]
        rows = jnp.pad(rows, ((0, h * lq - level.size), (0, 0)))
        per_level.append(rows.reshape(h, lq * F))
    return jnp.concatenate(per_level, axis=0).astype(jnp.bfloat16)


def unpack_table_grads_fl(plan: GridKernelPlan, packed, n_params: int):
    """[fl_h_total, 128] f32 -> flat fp32 [n_params] (repack_table_fl's
    inverse)."""
    F = plan.f
    lq = LANE // F
    if _uniform_levels(plan) and plan.levels[0].size % lq == 0:
        return packed.reshape(-1)
    parts = []
    geom, _ = fl_levels(plan)
    for level, (off, h) in zip(plan.levels, geom):
        block = packed[off : off + h]  # [h, 128]
        parts.append(block.reshape(h * lq, F)[: level.size].reshape(-1))
    return jnp.concatenate(parts)


def unpack_table_grads(plan: GridKernelPlan, packed, n_params: int):
    """[H_total, 128*F] f32 -> flat fp32 [n_params]."""
    F = plan.f
    if _uniform_levels(plan):
        nl, h = plan.n_levels, plan.levels[0].h
        t = packed.reshape(nl * h, F, LANE)
        return jnp.swapaxes(t, 1, 2).reshape(-1)
    parts = []
    for level in plan.levels:
        block = packed[level.row_off : level.row_off + level.h]  # [H, 128F]
        feats = [
            block[:, f * LANE : (f + 1) * LANE].reshape(level.h * LANE)
            for f in range(F)
        ]
        rows = jnp.stack(feats, axis=-1)[: level.size]  # [size, F]
        parts.append(rows.reshape(-1))
    return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# Shared in-kernel math (lane-oriented: levels x dims live in lanes)
# ---------------------------------------------------------------------------


def _as_i32(v: int) -> int:
    """uint32 value -> the int32 with the same bit pattern (int32 multiply /
    add / xor wrap identically to uint32, so all index math runs in int32)."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


#: order of the constant-row kernel inputs built by _plan_constants
_CONST_NAMES = (
    "scales",  # f32 [1, D*L]
    "strides",  # i32 [1, D*L]
    "factors",  # i32 [1, D*L]
    "hash_mask",  # i32 [1, L] (1 = hashed level)
    "pow2_mask",  # i32 [1, L] (1 = power-of-two table size)
    "size_m1",  # i32 [1, L]
    "size_f",  # f32 [1, L]
    "corner_bits",  # i32 [C, D*L]: row c, col d*L+l = (c >> d) & 1
)


def _plan_constants(plan: GridKernelPlan):
    """Per-lane constant rows in the dim-major [1, D*L] layout (col = d*L+l).
    Pallas kernels may not capture array constants, so these are passed as
    (tiny, replicated) kernel inputs."""
    L, D = plan.n_levels, plan.d
    scales = np.zeros(D * L, np.float32)
    strides = np.zeros(D * L, np.int64)
    factors = np.zeros(D * L, np.int64)
    for d in range(D):
        for l, level in enumerate(plan.levels):
            scales[d * L + l] = level.scale
            strides[d * L + l] = (
                _as_i32(level.strides[d]) if level.alive[d] else 0
            )
            factors[d * L + l] = _as_i32(plan.hash_factors[d])
    hash_mask = np.asarray(
        [1 if lvl.use_hash else 0 for lvl in plan.levels], np.int32
    )
    pow2_mask = np.asarray(
        [1 if lvl.pow2 else 0 for lvl in plan.levels], np.int32
    )
    size_m1 = np.asarray([lvl.size - 1 for lvl in plan.levels], np.int32)
    size_f = np.asarray([lvl.size for lvl in plan.levels], np.float32)
    C = 1 << D
    corner_bits = np.zeros((C, D * L), np.int32)
    for c in range(C):
        for d in range(D):
            corner_bits[c, d * L : (d + 1) * L] = (c >> d) & 1
    return {
        "scales": scales[None, :],
        "strides": strides.astype(np.int32)[None, :],
        "factors": factors.astype(np.int32)[None, :],
        "hash_mask": hash_mask[None, :],
        "pow2_mask": pow2_mask[None, :],
        "size_m1": size_m1[None, :],
        "size_f": size_f[None, :],
        "corner_bits": corner_bits,
    }


def _const_specs(consts):
    return [
        pl.BlockSpec(
            consts[name].shape, lambda g: (0, 0), memory_space=pltpu.VMEM
        )
        for name in _CONST_NAMES
    ]


def _const_args(consts):
    return [jnp.asarray(consts[name]) for name in _CONST_NAMES]


def _positions(plan: GridKernelPlan, x, cr):
    """x [Nt, D] -> (cells i32 [Nt, D*L], w f32 [Nt, D*L]) dim-major lanes."""
    L, D = plan.n_levels, plan.d
    # [Nt, D*L]: column d*L + l carries dim d of level l
    xx = jnp.concatenate(
        [jnp.broadcast_to(x[:, d : d + 1], (x.shape[0], L)) for d in range(D)],
        axis=1,
    )
    pos = xx * cr["scales"] + 0.5
    cell_f = jnp.floor(pos)
    fract = pos - cell_f
    cells = cell_f.astype(jnp.int32)
    if plan.interpolation == InterpolationType.Smoothstep:
        w = smoothstep(fract)
    else:
        w = fract
    return cells, w


def _corner_indices_and_weights(
    plan: GridKernelPlan, cells, w, cr, want_terms: bool = False, ext=None
):
    """Returns per-corner (idx [Nt, L] i32, weight [Nt, L] f32 or None).
    With want_terms, each entry is (idx, cw, terms) where terms[d] is the
    per-dim selected factor [Nt, L] (w_d or 1-w_d) - needed for dW/dx.
    `ext` [Nt, C*L] supplies precomputed hash values (HashType.Rng)."""
    L, D = plan.n_levels, plan.d

    nearest = plan.interpolation == InterpolationType.Nearest
    corners = [0] if nearest else range(1 << D)
    # per-corner bit rows are compile-time 0/1 patterns; build them from the
    # strides/factors rows with python-scalar selects (no array constants)
    dim_cols = [slice(d * L, (d + 1) * L) for d in range(D)]
    out = []
    for corner in corners:
        csum = None
        hxor = None
        cw = None
        terms = []
        for d in range(D):
            bit = (corner >> d) & 1
            cc = cells[:, dim_cols[d]] + bit  # [Nt, L]
            dmul = cc * cr["strides"][:, dim_cols[d]]
            hmul = cc * cr["factors"][:, dim_cols[d]]
            csum = dmul if csum is None else csum + dmul
            hxor = hmul if hxor is None else hxor ^ hmul
            if not nearest:
                wd = w[:, dim_cols[d]]
                term = wd if bit else 1.0 - wd
                cw = term if cw is None else cw * term
                if want_terms:
                    terms.append(term)
        if ext is not None:
            hxor = ext[:, corner * L : (corner + 1) * L]
        raw = jnp.where(cr["hash_mask"] == 1, hxor, csum)  # [Nt, L]

        idx_and = raw & cr["size_m1"]
        fraw = raw.astype(jnp.float32)
        idx_fmod = (
            fraw - jnp.floor(fraw / cr["size_f"]) * cr["size_f"]
        ).astype(jnp.int32)
        idx = jnp.where(cr["pow2_mask"] == 1, idx_and, idx_fmod)
        out.append((idx, cw, terms) if want_terms else (idx, cw))
    return out


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _stacked_hi_lo_w(plan, cells, w, cr, ext=None):
    """Corner-stacked index planes: HI, LO i32 [C*Nt, L]; W f32 [C*Nt, L]
    (or None for Nearest). Computed in wide lane-packed ops ONCE - thin
    [*, 1] column arithmetic is catastrophically wasteful on the VPU (each
    op touches a full [8, 128] vreg for 8 useful values)."""
    per_corner = _corner_indices_and_weights(plan, cells, w, cr, ext=ext)
    idx = jnp.concatenate([i for i, _ in per_corner], axis=0)  # [C*Nt, L]
    hi = idx >> 7
    lo = idx & (LANE - 1)
    if per_corner[0][1] is None:
        return hi, lo, None
    cw = jnp.concatenate([w_ for _, w_ in per_corner], axis=0)
    return hi, lo, cw


def _stacked_hi_lo_w_v2(plan: GridKernelPlan, cells, w, cr, ext=None):
    """Round-3 corner expansion: same contract as _stacked_hi_lo_w (HI, LO
    i32 [C*Nt, L]; W f32 [C*Nt, L] or None) but computed directly in the
    corner-STACKED row layout with wide ops: the cells/weights are
    row-tiled C times (identical-layout row concats - legal, unlike
    row-concatenating lane-slices, a Mosaic 'offset mismatch' error), and
    the per-corner bits come from a row-iota (corner = row // Nt), so the
    per-corner +bit / *stride / xor / term math is ~12 wide [C*Nt, D*L]
    ops instead of ~70 per-corner [Nt, L] slices (measured: idx+stack
    7.1 ms -> 1.6 ms on the b=2^18 fwd, scripts/ablate_fwd_r3.py).

    `ext` (HashType.Rng precomputed hashes) must arrive corner-STACKED as
    [C*Nt, L] (see compute_ext_hash_stacked)."""
    L, D = plan.n_levels, plan.d
    if plan.interpolation == InterpolationType.Nearest:
        return _stacked_hi_lo_w(plan, cells, w, cr, ext=ext)
    C = 1 << D
    nt = cells.shape[0]

    cells_s = jnp.concatenate([cells] * C, axis=0)  # [C*Nt, D*L]
    w_s = jnp.concatenate([w] * C, axis=0)
    # per-corner bit rows from the precomputed constant (a row-iota //
    # where-chain construction compiled ~12x slower in Mosaic)
    cb = cr["corner_bits"]  # [C, D*L]
    bits = jnp.concatenate(
        [jnp.broadcast_to(cb[c : c + 1, :], (nt, D * L)) for c in range(C)],
        axis=0,
    )

    cc = cells_s + bits
    dmul = cc * cr["strides"]  # [1, D*L] broadcast rows
    hmul = cc * cr["factors"]
    csum = dmul[:, :L]
    hxor = hmul[:, :L]
    for d in range(1, D):
        csum = csum + dmul[:, d * L : (d + 1) * L]
        hxor = hxor ^ hmul[:, d * L : (d + 1) * L]
    # term = bit ? w : 1-w, then product over dims
    term = (1.0 - w_s) + bits.astype(jnp.float32) * (2.0 * w_s - 1.0)
    cw = term[:, :L]
    for d in range(1, D):
        cw = cw * term[:, d * L : (d + 1) * L]

    if ext is not None:
        hxor = ext  # [C*Nt, L] corner-stacked
    raw = jnp.where(cr["hash_mask"] == 1, hxor, csum)  # [C*Nt, L]
    idx_and = raw & cr["size_m1"]
    fraw = raw.astype(jnp.float32)
    idx_fmod = (
        fraw - jnp.floor(fraw / cr["size_f"]) * cr["size_f"]
    ).astype(jnp.int32)
    idx = jnp.where(cr["pow2_mask"] == 1, idx_and, idx_fmod)
    return idx >> 7, idx & (LANE - 1), cw


def _level_masks(plan, hi, lo, cw, l, h, nt):
    """One level's (oh [C*Nt, h] bf16 hi one-hot, ohlo_w [C*Nt, 128] f32
    weight-folded lane mask) from the corner-stacked index arrays. The
    interpolation weight is folded into the lane-mask SELECT (one op, not
    select+multiply)."""
    rows = hi.shape[0]
    oh = (
        hi[:, l : l + 1]
        == jax.lax.broadcasted_iota(jnp.int32, (rows, h), 1)
    ).astype(jnp.bfloat16)
    lmask = lo[:, l : l + 1] == jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANE), 1
    )
    if cw is not None:
        ohlo_w = jnp.where(lmask, cw[:, l : l + 1], 0.0)
    else:
        ohlo_w = lmask.astype(jnp.float32)
    return oh, ohlo_w


def compute_ext_hash(plan: GridKernelPlan, x):
    """Precomputed per-corner Rng-hash values [B, C*L] i32 (col c*L + l).

    Replicates the kernels' cell math (same IEEE mul/add/floor as
    _positions) then runs the PCG32-advance hash (common_device.h:663-677)
    via ops/pcg32.rng_hash - elementwise work XLA handles well; only the
    gather/scatter needed Pallas."""
    from ..pcg32 import rng_hash

    L, D = plan.n_levels, plan.d
    scales = jnp.asarray(
        np.asarray([lvl.scale for lvl in plan.levels], np.float32)
    )
    pos = x[:, None, :] * scales[None, :, None] + 0.5  # [B, L, D]
    cells = jnp.floor(pos).astype(jnp.int32)
    corners = [0] if plan.interpolation == InterpolationType.Nearest else (
        range(1 << D)
    )
    cols = []
    for corner in corners:
        bits = jnp.asarray(
            [(corner >> d) & 1 for d in range(D)], jnp.int32
        )
        cc = (cells + bits[None, None, :]).astype(jnp.uint32)  # [B, L, D]
        cols.append(rng_hash(cc, D).astype(jnp.int32))  # [B, L]
    return jnp.concatenate(cols, axis=1)  # [B, C*L]


def compute_ext_hash_stacked(plan: GridKernelPlan, x):
    """compute_ext_hash rearranged to [C, B, L] so kernels can merge the
    LEADING dims into the corner-stacked [C*Nt, L] row layout in-kernel
    (lane->row relayouts are not expressible in Mosaic)."""
    ext = compute_ext_hash(plan, x)  # [B, C*L]
    b = ext.shape[0]
    C = plan.n_corners
    return jnp.swapaxes(ext.reshape(b, C, plan.n_levels), 0, 1)


def _ext_dummy(plan: GridKernelPlan, x):
    if plan.ext_hash:
        return compute_ext_hash(plan, x)
    return jnp.zeros((1, 1), jnp.int32)


def _fwd_kernel(x_ref, table_ref, *const_and_out, plan: GridKernelPlan):
    if plan.ext_hash:
        ext_ref = const_and_out[0]
        const_and_out = const_and_out[1:]
    const_refs, y_ref = const_and_out[:-1], const_and_out[-1]
    cr = {name: ref[:] for name, ref in zip(_CONST_NAMES, const_refs)}
    x = x_ref[:]
    nt = x.shape[0]
    F, C, L = plan.f, plan.n_corners, plan.n_levels

    cells, w = _positions(plan, x, cr)
    # ext arrives [C, Nt, L] (compute_ext_hash_stacked); merge the leading
    # dims into the corner-stacked row layout
    ext = (
        ext_ref[:].reshape(-1, plan.n_levels) if plan.ext_hash else None
    )
    hi_cl, lo_cl, cw_cl = _stacked_hi_lo_w_v2(plan, cells, w, cr, ext=ext)

    # feature-MAJOR column order inside the kernel (col = f*L + l): the
    # weight expansion is then a plain lane concat (Mosaic rejects the
    # interleaving reshape); the wrapper permutes back to l-major f-minor.
    cols = [[] for _ in range(F)]
    for l, level in enumerate(plan.levels):
        # extract column lo via mask + lane reduction: 1.7x faster than
        # Mosaic's take_along_axis lane gather (measured), bit-identical.
        # The interpolation weight is folded into the SELECT (one op).
        oh, ohlo = _level_masks(plan, hi_cl, lo_cl, cw_cl, l, level.h, nt)
        tbl = table_ref[level.row_off : level.row_off + level.h, :]
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)  # [CNt,128F]
        for f in range(F):
            cols[f].append(
                jnp.sum(
                    g[:, f * LANE : (f + 1) * LANE] * ohlo,
                    axis=1,
                    keepdims=True,
                )
            )

    picked = jnp.concatenate(sum(cols, []), axis=1)  # [C*Nt, F*L] f-major
    y_ref[:] = picked.reshape(C, nt, F * L).sum(axis=0).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernel (table gradients; deterministic, accumulated across tiles)
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, gy_ref, *const_and_out, plan: GridKernelPlan):
    if plan.ext_hash:
        ext_ref = const_and_out[0]
        const_and_out = const_and_out[1:]
    const_refs, gtable_ref = const_and_out[:-1], const_and_out[-1]
    cr = {name: ref[:] for name, ref in zip(_CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    x = x_ref[:]
    gy = gy_ref[:].astype(jnp.float32)
    nt = x.shape[0]
    F, C, L = plan.f, plan.n_corners, plan.n_levels

    cells, w = _positions(plan, x, cr)
    # ext arrives [C, Nt, L] (compute_ext_hash_stacked); merge the leading
    # dims into the corner-stacked row layout
    ext = (
        ext_ref[:].reshape(-1, plan.n_levels) if plan.ext_hash else None
    )
    hi_cl, lo_cl, cw_cl = _stacked_hi_lo_w_v2(plan, cells, w, cr, ext=ext)

    # per-sample cotangents in feature-MAJOR lanes (col = f*L + l); the
    # corner weight is folded into the lane-mask SELECT in _level_masks.
    a = jnp.concatenate([gy] * C, axis=0)  # [C*Nt, F*L]

    for l, level in enumerate(plan.levels):
        oh, ohlo = _level_masks(plan, hi_cl, lo_cl, cw_cl, l, level.h, nt)
        rhs = jnp.concatenate(
            [ohlo * a[:, f * L + l : f * L + l + 1] for f in range(F)],
            axis=1,
        ).astype(jnp.bfloat16)  # [C*Nt, 128*F]
        contrib = jax.lax.dot_general(
            oh,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H_l, 128*F]
        sl = slice(level.row_off, level.row_off + level.h)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib


# ---------------------------------------------------------------------------
# Stochastic backward kernel (grid.h:284-299): each (sample, level) scatters
# its full dL/dy into ONE corner chosen by comparing a per-(sample, level)
# uniform draw with the interpolation weights. The chosen-corner index is
# computed with DYNAMIC per-sample bits, so the scatter matmul runs at
# M = Nt instead of M = C*Nt - 2^D x cheaper than the exact scatter.
# ---------------------------------------------------------------------------


def _stoch_index(plan, cells, w, u, cr, ext):
    """Chosen-corner table index [Nt, L] with DYNAMIC per-sample corner
    bits bit_d = (u < w_d) (grid.h:288-296). With ext_hash, the chosen
    corner's precomputed hash is selected from the C per-corner columns."""
    L, D = plan.n_levels, plan.d
    u_dl = jnp.concatenate([u] * D, axis=1)  # [Nt, D*L]
    bits = (u_dl < w).astype(jnp.int32)

    csum = None
    hxor = None
    for d in range(D):
        sl_d = slice(d * L, (d + 1) * L)
        cc = cells[:, sl_d] + bits[:, sl_d]
        dmul = cc * cr["strides"][:, sl_d]
        hmul = cc * cr["factors"][:, sl_d]
        csum = dmul if csum is None else csum + dmul
        hxor = hmul if hxor is None else hxor ^ hmul
    if ext is not None:
        corner_id = None  # [Nt, L]
        for d in range(D):
            contrib = bits[:, d * L : (d + 1) * L] << d
            corner_id = contrib if corner_id is None else corner_id | contrib
        hxor = None
        for c in range(1 << D):
            sel = jnp.where(
                corner_id == c, ext[:, c * L : (c + 1) * L], 0
            )
            hxor = sel if hxor is None else hxor | sel
    raw = jnp.where(cr["hash_mask"] == 1, hxor, csum)
    idx_and = raw & cr["size_m1"]
    fraw = raw.astype(jnp.float32)
    idx_fmod = (fraw - jnp.floor(fraw / cr["size_f"]) * cr["size_f"]).astype(
        jnp.int32
    )
    return jnp.where(cr["pow2_mask"] == 1, idx_and, idx_fmod)


def _bwd_stoch_kernel(x_ref, gy_ref, u_ref, *const_and_out, plan):
    if plan.ext_hash:
        ext_ref = const_and_out[0]
        const_and_out = const_and_out[1:]
    const_refs, gtable_ref = const_and_out[:-1], const_and_out[-1]
    cr = {name: ref[:] for name, ref in zip(_CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    x = x_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # f-major [Nt, F*L]
    u = u_ref[:]  # [Nt, L]
    nt = x.shape[0]
    F, L, D = plan.f, plan.n_levels, plan.d

    cells, w = _positions(plan, x, cr)
    ext = ext_ref[:] if plan.ext_hash else None
    idx = _stoch_index(plan, cells, w, u, cr, ext)  # [Nt, L]
    hi = idx >> 7
    lo = idx & (LANE - 1)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nt, LANE), 1)
    for l, level in enumerate(plan.levels):
        oh = (
            hi[:, l : l + 1]
            == jax.lax.broadcasted_iota(jnp.int32, (nt, level.h), 1)
        ).astype(jnp.bfloat16)
        ohlo = (lo[:, l : l + 1] == lane_iota).astype(jnp.float32)
        rhs = jnp.concatenate(
            [ohlo * gy[:, f * L + l : f * L + l + 1] for f in range(F)],
            axis=1,
        ).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            oh, rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(level.row_off, level.row_off + level.h)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib


def _bwd_stoch_call(plan: GridKernelPlan, x, gy, u):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = _plan_constants(plan)
    ext_specs, ext_args = _ext_specs_args(plan, x)
    return pl.pallas_call(
        functools.partial(_bwd_stoch_kernel, plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nt, plan.out_width), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nt, plan.n_levels), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ]
        + ext_specs
        + _const_specs(consts),
        out_specs=pl.BlockSpec(
            (plan.h_total, LANE * plan.f),
            lambda g: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (plan.h_total, LANE * plan.f), jnp.float32
        ),
        compiler_params=_VMEM_LIMIT,
    )(x, gy, u, *ext_args, *_const_args(consts))


# ---------------------------------------------------------------------------
# Backward kernel WITH input gradients (kernel_grid_backward +
# kernel_grid_backward_input, grid.h:214-349, fused: the feature re-gather
# needed for dL/dx shares the one-hot masks with the table scatter)
# ---------------------------------------------------------------------------


def _bwd_ig_kernel(x_ref, gy_ref, table_ref, *const_and_out, plan):
    if plan.ext_hash:
        ext_ref = const_and_out[0]
        const_and_out = const_and_out[1:]
    const_refs = const_and_out[:-2]
    gtable_ref, gx_ref = const_and_out[-2], const_and_out[-1]
    cr = {name: ref[:] for name, ref in zip(_CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    x = x_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # f-major [Nt, F*L]
    nt = x.shape[0]
    F, C, L, D = plan.f, plan.n_corners, plan.n_levels, plan.d

    # positions + per-dim interpolation terms and their x-derivatives
    L_, D_ = L, D
    xx = jnp.concatenate(
        [jnp.broadcast_to(x[:, d : d + 1], (nt, L_)) for d in range(D_)],
        axis=1,
    )
    pos = xx * cr["scales"] + 0.5
    cell_f = jnp.floor(pos)
    fract = pos - cell_f
    cells = cell_f.astype(jnp.int32)
    if plan.interpolation == InterpolationType.Smoothstep:
        w = smoothstep(fract)
        # d smoothstep(t)/dx = 6 t (1-t) * scale
        deriv = 6.0 * fract * (1.0 - fract) * cr["scales"]
    else:
        w = fract
        deriv = jnp.broadcast_to(cr["scales"], fract.shape)

    per_corner = _corner_indices_and_weights(
        plan, cells, w, cr, want_terms=True,
        ext=ext_ref[:] if plan.ext_hash else None,
    )
    idx = jnp.concatenate([i for i, _, _ in per_corner], axis=0)
    hi = idx >> 7
    lo = idx & (LANE - 1)
    cw = jnp.concatenate([c for _, c, _ in per_corner], axis=0)

    gy_c = jnp.concatenate([gy] * C, axis=0)  # [C*Nt, F*L]
    cwf = jnp.concatenate([cw] * F, axis=1) if F > 1 else cw
    a = gy_c * cwf  # weighted scatter values, f-major

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (C * nt, LANE), 1)

    picked_cols = [[] for _ in range(F)]
    for l, level in enumerate(plan.levels):
        oh = (
            hi[:, l : l + 1]
            == jax.lax.broadcasted_iota(jnp.int32, (C * nt, level.h), 1)
        ).astype(jnp.bfloat16)
        ohlo = (lo[:, l : l + 1] == lane_iota).astype(jnp.float32)
        tbl = table_ref[level.row_off : level.row_off + level.h, :]
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        # unweighted per-corner feature values (for dL/dx)
        for f in range(F):
            picked_cols[f].append(
                jnp.sum(
                    g[:, f * LANE : (f + 1) * LANE] * ohlo,
                    axis=1,
                    keepdims=True,
                )
            )
        # table scatter (same as _bwd_kernel)
        rhs = jnp.concatenate(
            [ohlo * a[:, f * L + l : f * L + l + 1] for f in range(F)],
            axis=1,
        ).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            oh, rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(level.row_off, level.row_off + level.h)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib

    # dL/dx: sum over levels/corners of (sum_f feat*gy) * dW_c/dx_d
    dot_all = None  # [C*Nt, L]
    for f in range(F):
        pf = jnp.concatenate(picked_cols[f], axis=1)  # [C*Nt, L]
        term = pf * gy_c[:, f * L : (f + 1) * L]
        dot_all = term if dot_all is None else dot_all + term

    deriv_c = jnp.concatenate([deriv] * C, axis=0)  # [C*Nt, D*L]
    gx_cols = []
    for d in range(D):
        prodsgn = []
        for corner_i, (_, _, terms) in enumerate(per_corner):
            sgn = 1.0 if (corner_i >> d) & 1 else -1.0
            other = None
            for d2 in range(D):
                if d2 == d:
                    continue
                other = terms[d2] if other is None else other * terms[d2]
            if other is None:
                other = jnp.ones_like(terms[0])
            prodsgn.append(sgn * other)
        prodsgn = jnp.concatenate(prodsgn, axis=0)  # [C*Nt, L]
        contrib = dot_all * prodsgn * deriv_c[:, d * L : (d + 1) * L]
        gx_cols.append(jnp.sum(contrib, axis=1, keepdims=True))  # [C*Nt, 1]
    gx = jnp.concatenate(gx_cols, axis=1)  # [C*Nt, D]
    gx_ref[:] = gx.reshape(C, nt, D).sum(axis=0).astype(gx_ref.dtype)


def _bwd_ig_call(plan: GridKernelPlan, table_packed, x, gy):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = _plan_constants(plan)
    ext_specs, ext_args = _ext_specs_args(plan, x)
    return pl.pallas_call(
        functools.partial(_bwd_ig_kernel, plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nt, plan.out_width), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + ext_specs
        + _const_specs(consts),
        out_specs=[
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((plan.h_total, LANE * plan.f), jnp.float32),
            jax.ShapeDtypeStruct((b, x.shape[1]), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
    )(x, gy, table_packed, *ext_args, *_const_args(consts))


# ---------------------------------------------------------------------------
# Second-order kernel: the vjp of the (gparams, gx) backward itself -
# the reference's backward_backward_input trio (grid.h:351-650:
# kernel_grid_backward_input_backward_{grid, dLdoutput, input}), fused into
# one pass sharing index math and one-hots.
#
# Given cotangents (ct_gparams, z = dL2/d(gx)):
#   ct_gy[l,f]   = sum_c picked(table)_c * zw_c + picked(ct_table)_c * W_c
#   ct_params    = scatter_c of zw_c * gy_f            (..._backward_grid)
#   ct_x[d']     = sum_c dotf_c * [sum_d z_d * d2W_c/dx_d dx_d']   (Hessian)
#                + sum_c dotf2_c * dW_c/dx_d'           (via ct_table)
# where zw_c = sum_d z_d * dW_c/dx_d. Unlike the reference (which documents
# d(dL_dgrid)/dx unsupported and implements the Hessian diagonal only for
# smoothstep), ALL blocks are implemented - including the off-diagonal
# Hessian terms (for Linear interpolation the diagonal is identically 0).
# ---------------------------------------------------------------------------


def _bwd_bwd_kernel(x_ref, gy_ref, z_ref, table_ref, ct_table_ref,
                    *const_and_out, plan):
    if plan.ext_hash:
        ext_ref = const_and_out[0]
        const_and_out = const_and_out[1:]
    const_refs = const_and_out[:-3]
    ct_gy_ref, gtable2_ref, ct_x_ref = const_and_out[-3:]
    cr = {name: ref[:] for name, ref in zip(_CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable2_ref[:] = jnp.zeros_like(gtable2_ref)

    x = x_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # f-major [Nt, F*L]
    z = z_ref[:].astype(jnp.float32)  # [Nt, D]
    nt = x.shape[0]
    F, C, L, D = plan.f, plan.n_corners, plan.n_levels, plan.d

    xx = jnp.concatenate(
        [jnp.broadcast_to(x[:, d : d + 1], (nt, L)) for d in range(D)],
        axis=1,
    )
    pos = xx * cr["scales"] + 0.5
    cell_f = jnp.floor(pos)
    fract = pos - cell_f
    cells = cell_f.astype(jnp.int32)
    if plan.interpolation == InterpolationType.Smoothstep:
        w = smoothstep(fract)
        deriv = 6.0 * fract * (1.0 - fract) * cr["scales"]
        deriv2 = 6.0 * (1.0 - 2.0 * fract) * cr["scales"] * cr["scales"]
    else:
        w = fract
        deriv = jnp.broadcast_to(cr["scales"], fract.shape)
        deriv2 = jnp.zeros_like(fract)

    per_corner = _corner_indices_and_weights(
        plan, cells, w, cr, want_terms=True,
        ext=ext_ref[:] if plan.ext_hash else None,
    )
    idx = jnp.concatenate([i for i, _, _ in per_corner], axis=0)
    hi = idx >> 7
    lo = idx & (LANE - 1)
    cw = jnp.concatenate([c for _, c, _ in per_corner], axis=0)  # [CNt, L]

    # per-corner dW_c/dx_d pieces, corner-stacked [C*Nt, L] per dim
    def _prod_excluding(terms, excl):
        out = None
        for d2 in range(D):
            if d2 in excl:
                continue
            out = terms[d2] if out is None else out * terms[d2]
        return out if out is not None else jnp.ones_like(terms[0])

    deriv_c = jnp.concatenate([deriv] * C, axis=0)  # [C*Nt, D*L]
    deriv2_c = jnp.concatenate([deriv2] * C, axis=0)
    z_c = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.broadcast_to(z[:, d : d + 1], (nt, L)) for d in range(D)],
                axis=1,
            )
        ]
        * C,
        axis=0,
    )  # [C*Nt, D*L]

    dw = []  # per dim d: [C*Nt, L] = dW_c/dx_d (corner-stacked)
    for d in range(D):
        parts = []
        for corner_i, (_, _, terms) in enumerate(per_corner):
            sgn = 1.0 if (corner_i >> d) & 1 else -1.0
            parts.append(sgn * _prod_excluding(terms, (d,)))
        dw.append(
            jnp.concatenate(parts, axis=0)
            * deriv_c[:, d * L : (d + 1) * L]
        )
    zw = None  # [C*Nt, L] = sum_d z_d * dW_c/dx_d
    for d in range(D):
        t = z_c[:, d * L : (d + 1) * L] * dw[d]
        zw = t if zw is None else zw + t

    gy_c = jnp.concatenate([gy] * C, axis=0)  # [C*Nt, F*L]
    zwf = jnp.concatenate([zw] * F, axis=1) if F > 1 else zw
    scatter_vals = gy_c * zwf  # f-major scatter values for ct_params

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (C * nt, LANE), 1)
    picked_cols = [[] for _ in range(F)]  # from table
    picked2_cols = [[] for _ in range(F)]  # from ct_table
    for l, level in enumerate(plan.levels):
        oh = (
            hi[:, l : l + 1]
            == jax.lax.broadcasted_iota(jnp.int32, (C * nt, level.h), 1)
        ).astype(jnp.bfloat16)
        ohlo = (lo[:, l : l + 1] == lane_iota).astype(jnp.float32)
        sl = slice(level.row_off, level.row_off + level.h)
        g1 = jnp.dot(oh, table_ref[sl, :], preferred_element_type=jnp.float32)
        g2 = jnp.dot(
            oh, ct_table_ref[sl, :], preferred_element_type=jnp.float32
        )
        for f in range(F):
            fs = slice(f * LANE, (f + 1) * LANE)
            picked_cols[f].append(
                jnp.sum(g1[:, fs] * ohlo, axis=1, keepdims=True)
            )
            picked2_cols[f].append(
                jnp.sum(g2[:, fs] * ohlo, axis=1, keepdims=True)
            )
        # ct_params scatter: zw_c * gy (..._backward_grid, grid.h:351-455)
        rhs = jnp.concatenate(
            [
                ohlo * scatter_vals[:, f * L + l : f * L + l + 1]
                for f in range(F)
            ],
            axis=1,
        ).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            oh, rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gtable2_ref[sl, :] = gtable2_ref[sl, :] + contrib

    # ct_gy (f-major): picked*zw + picked2*W (..._backward_dLdoutput)
    ct_gy_parts = []
    for f in range(F):
        p1 = jnp.concatenate(picked_cols[f], axis=1)  # [C*Nt, L]
        p2 = jnp.concatenate(picked2_cols[f], axis=1)
        ct_gy_parts.append(p1 * zw + p2 * cw)
    ct_gy = jnp.concatenate(ct_gy_parts, axis=1)  # [C*Nt, F*L] f-major
    ct_gy_ref[:] = (
        ct_gy.reshape(C, nt, F * L).sum(axis=0).astype(ct_gy_ref.dtype)
    )

    # per-corner gy-contracted features
    dotf = None  # [C*Nt, L] from table
    dotf2 = None  # from ct_table
    for f in range(F):
        p1 = jnp.concatenate(picked_cols[f], axis=1)
        p2 = jnp.concatenate(picked2_cols[f], axis=1)
        gyf = gy_c[:, f * L : (f + 1) * L]
        dotf = p1 * gyf if dotf is None else dotf + p1 * gyf
        dotf2 = p2 * gyf if dotf2 is None else dotf2 + p2 * gyf

    # ct_x[d'] = dotf * sum_d z_d d2W/dx_d dx_d'  +  dotf2 * dW/dx_d'
    ct_x_cols = []
    for dp in range(D):
        hess = None  # [C*Nt, L] = sum_d z_d * d2W_c/dx_d dx_dp
        for d in range(D):
            if d == dp:
                parts = []
                for corner_i, (_, _, terms) in enumerate(per_corner):
                    sgn = 1.0 if (corner_i >> d) & 1 else -1.0
                    parts.append(sgn * _prod_excluding(terms, (d,)))
                block = (
                    jnp.concatenate(parts, axis=0)
                    * deriv2_c[:, d * L : (d + 1) * L]
                )
            else:
                parts = []
                for corner_i, (_, _, terms) in enumerate(per_corner):
                    sgn_d = 1.0 if (corner_i >> d) & 1 else -1.0
                    sgn_p = 1.0 if (corner_i >> dp) & 1 else -1.0
                    parts.append(sgn_d * sgn_p * _prod_excluding(terms, (d, dp)))
                block = (
                    jnp.concatenate(parts, axis=0)
                    * deriv_c[:, d * L : (d + 1) * L]
                    * deriv_c[:, dp * L : (dp + 1) * L]
                )
            t = z_c[:, d * L : (d + 1) * L] * block
            hess = t if hess is None else hess + t
        contrib = dotf * hess + dotf2 * dw[dp]
        ct_x_cols.append(jnp.sum(contrib, axis=1, keepdims=True))
    ct_x = jnp.concatenate(ct_x_cols, axis=1)  # [C*Nt, D]
    ct_x_ref[:] = ct_x.reshape(C, nt, D).sum(axis=0).astype(ct_x_ref.dtype)


def _bwd_bwd_call(plan, table_packed, ct_table_packed, x, gy_fm, z):
    b = x.shape[0]
    # the second-order kernel keeps ~3x more per-corner intermediates live
    # than the first-order backward (two tables + Hessian pieces) - run a
    # smaller batch tile to stay inside VMEM
    nt = max(plan.batch_tile // (8 if plan.d >= 3 else 4), 128)
    consts = _plan_constants(plan)
    ext_specs, ext_args = _ext_specs_args(plan, x, nt=nt)
    tbl_spec = pl.BlockSpec(
        (plan.h_total, LANE * plan.f), lambda g: (0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_bwd_bwd_kernel, plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, plan.out_width), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            tbl_spec,
            tbl_spec,
        ]
        + ext_specs
        + _const_specs(consts),
        out_specs=[
            pl.BlockSpec((nt, plan.out_width), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            tbl_spec,
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, plan.out_width), jnp.float32),
            jax.ShapeDtypeStruct((plan.h_total, LANE * plan.f), jnp.float32),
            jax.ShapeDtypeStruct((b, x.shape[1]), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
    )(x, gy_fm, z, table_packed, ct_table_packed, *ext_args,
      *_const_args(consts))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ig_backward(plan, n_params, params, x, gy):
    """(gparams, gx) = the ig path's backward, as a DIFFERENTIABLE function
    (public-layout gy). Its own vjp is the bwd-bwd kernel above, so
    grad-of-grad (eikonal training etc.) works through the Pallas path."""
    _, to_fmajor = _fmajor_perm(plan)
    table_packed = repack_table(plan, params)
    gpacked, gx = _bwd_ig_call(plan, table_packed, x, gy[:, to_fmajor])
    return unpack_table_grads(plan, gpacked, n_params), gx


def _ig_backward_fwd(plan, n_params, params, x, gy):
    return _ig_backward(plan, n_params, params, x, gy), (params, x, gy)


def _ig_backward_bwd(plan, n_params, res, cts):
    params, x, gy = res
    ct_gparams, z = cts
    to_public, to_fmajor = _fmajor_perm(plan)
    table_packed = repack_table(plan, params)
    ct_table_packed = repack_table(plan, ct_gparams)
    ct_gy_fm, gtable2, ct_x = _bwd_bwd_call(
        plan, table_packed, ct_table_packed, x,
        gy[:, to_fmajor].astype(jnp.float32), z.astype(jnp.float32),
    )
    ct_params = unpack_table_grads(plan, gtable2, n_params)
    return (
        ct_params.astype(params.dtype),
        ct_x.astype(x.dtype),
        ct_gy_fm[:, to_public].astype(gy.dtype),
    )


_ig_backward.defvjp(_ig_backward_fwd, _ig_backward_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _grid_pallas_ig(plan, n_params, params, x):
    table_packed = repack_table(plan, params)
    to_public, _ = _fmajor_perm(plan)
    return _fwd_call(plan, table_packed, x)[:, to_public]


def _grid_pallas_ig_fwd(plan, n_params, params, x):
    return _grid_pallas_ig(plan, n_params, params, x), (params, x)


def _grid_pallas_ig_bwd(plan, n_params, res, gy):
    params, x = res
    gparams, gx = _ig_backward(plan, n_params, params, x, gy)
    return gparams, gx.astype(x.dtype)


_grid_pallas_ig.defvjp(_grid_pallas_ig_fwd, _grid_pallas_ig_bwd)


def grid_encode_pallas_ig(plan: GridKernelPlan, params, x):
    """Like grid_encode_pallas but the backward ALSO produces dL/dx, and
    the backward is itself differentiable (the bwd-bwd trio kernel above) -
    second-order training (eikonal SDF etc.) stays on the Pallas path.
    Third-order raises; use impl="xla" for arbitrary-order autodiff."""
    b = x.shape[0]
    nt = plan.batch_tile
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    y = _grid_pallas_ig(plan, int(params.shape[0]), params, x)
    return y[:b]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _ext_specs_args(plan: GridKernelPlan, x, nt=None, stacked=False):
    """Optional precomputed-hash kernel input (HashType.Rng). With
    `stacked`, the input is [C, B, L] (see compute_ext_hash_stacked) for
    kernels using the v2 corner-stacked index math."""
    if not plan.ext_hash:
        return [], []
    nt = plan.batch_tile if nt is None else nt
    if stacked:
        C, L = plan.n_corners, plan.n_levels
        spec = pl.BlockSpec((C, nt, L), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)
        return [spec], [compute_ext_hash_stacked(plan, x)]
    w = plan.n_corners * plan.n_levels
    spec = pl.BlockSpec((nt, w), lambda g: (g, 0), memory_space=pltpu.VMEM)
    return [spec], [compute_ext_hash(plan, x)]


def _fwd_call(plan: GridKernelPlan, table_packed, x):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = _plan_constants(plan)
    ext_specs, ext_args = _ext_specs_args(plan, x, stacked=True)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + ext_specs
        + _const_specs(consts),
        out_specs=pl.BlockSpec(
            (nt, plan.out_width), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, plan.out_width), jnp.bfloat16),
        compiler_params=_VMEM_LIMIT,
    )(x, table_packed, *ext_args, *_const_args(consts))


def _bwd_call(plan: GridKernelPlan, x, gy):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = _plan_constants(plan)
    ext_specs, ext_args = _ext_specs_args(plan, x, stacked=True)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nt, plan.out_width), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ]
        + ext_specs
        + _const_specs(consts),
        out_specs=pl.BlockSpec(
            (plan.h_total, LANE * plan.f),
            lambda g: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (plan.h_total, LANE * plan.f), jnp.float32
        ),
        compiler_params=_VMEM_LIMIT,
    )(x, gy, *ext_args, *_const_args(consts))


def _fmajor_perm(plan):
    """Column permutations between the kernel's f-major order (f*L + l) and
    the public l-major/f-minor order (l*F + f)."""
    L, F = plan.n_levels, plan.f
    to_public = np.asarray(
        [f * L + l for l in range(L) for f in range(F)], np.int32
    )
    to_fmajor = np.asarray(
        [l * F + f for f in range(F) for l in range(L)], np.int32
    )
    return to_public, to_fmajor


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _grid_pallas(plan, n_params, params, x, u):
    table_packed = repack_table(plan, params)
    to_public, _ = _fmajor_perm(plan)
    return _fwd_call(plan, table_packed, x)[:, to_public]


def _grid_pallas_fwd(plan, n_params, params, x, u):
    return _grid_pallas(plan, n_params, params, x, u), (x, u)


def _grid_pallas_bwd(plan, n_params, res, gy):
    x, u = res
    _, to_fmajor = _fmajor_perm(plan)
    if plan.stochastic:
        gpacked = _bwd_stoch_call(plan, x, gy[:, to_fmajor], u)
    else:
        gpacked = _bwd_call(plan, x, gy[:, to_fmajor])
    gparams = unpack_table_grads(plan, gpacked, n_params)
    # dL/dx intentionally zero: the Pallas path is only selected when input
    # gradients are not required (see GridEncoding.apply / docstring above).
    return gparams, jnp.zeros_like(x), jnp.zeros_like(u)


_grid_pallas.defvjp(_grid_pallas_fwd, _grid_pallas_bwd)


def stochastic_u_padded(b: int, padded: int, n_levels: int):
    """Per-(sample, level) corner uniforms drawn over the TRUE batch via the
    shared helper (one source for all stochastic paths - XLA, standalone
    Pallas, fused kernel), padded with 2.0 (u >= 1 -> corner bits all 0;
    padded rows have zero cotangent so the choice is irrelevant)."""
    from ..encodings.grid import stochastic_uniforms

    u = stochastic_uniforms(b, n_levels)
    if padded != b:
        u = jnp.pad(u, ((0, padded - b), (0, 0)), constant_values=2.0)
    return u


def grid_encode_pallas(plan: GridKernelPlan, params, x, u=None):
    """[B, D] fp32 -> [B, L*F] bf16 via the Pallas kernels. Pads the batch to
    the kernel tile and trims. `u` [B, L]: caller-supplied corner uniforms
    (used by grid_encode_split to keep the sliced levels' corners
    consistent with the full-width draw)."""
    b = x.shape[0]
    nt = plan.batch_tile
    padded = -(-b // nt) * nt
    if plan.stochastic:
        if u is None:
            u = stochastic_u_padded(b, padded, plan.n_levels)
        elif padded != b:
            u = jnp.pad(u, ((0, padded - b), (0, 0)), constant_values=2.0)
    else:
        u = jnp.zeros((1, 1), jnp.float32)  # unused placeholder
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    y = _grid_pallas(plan, int(params.shape[0]), params, x, u)
    return y[:b]
