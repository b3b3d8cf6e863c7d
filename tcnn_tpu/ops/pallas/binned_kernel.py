"""Binned Pallas kernels for LARGE grid-encoding hash tables.

Breaks the O(batch x total_table_rows) wall of the dense one-hot
formulation (grid_kernel.py), which caps out around 1.5M table rows - far
below the reference's DEFAULT config (log2_hashmap_size=19, i.e. ~5.6M rows
in 2D / ~7M in 3D, /root/reference/README.md:28-41, grid.h:1148-1160).

Idea: a matmul-native counting sort. Each level's table is split into S
superblocks of R rows. For every batch tile, picks (sample x corner) are
binned by superblock with an exact, deterministic, fully lane/MXU-friendly
pipeline - no sort primitive, no atomics, no data-dependent shapes:

  A (bin):    per (tile, level): superblock key k = idx & (S-1) (LOW bits
              - they mix every input dimension under the reference hashes,
              unlike the top bits; the table is stored permuted); the
              rank of each pick within its (subchunk, k) bin is computed
              with elementwise [256, 256] compare/reduce networks
              (duplicate indices are DEDUPLICATED: they share one slot, so
              degenerate inputs cannot overflow); first-occurrence picks
              place their row-in-superblock index into a [S, cap] slab via
              a one-hot x rank-one-hot placement matmul.
  B (gather): per (level, superblock): the slab's <= n_tiles*cap compact
              slots gather from the R-row table block with a transposed
              one-hot matmul + 128-lane pick; cost O(slots x R) instead of
              O(batch x t_rows).
  C (combine):per tile: each pick reads its slot's feature via a
              [G, S] x [S, cap*F] matmul + rank-lane pick, applies its
              interpolation weight, and reduces corners.
  P (place):  backward analog of A's placement: per-pick w * dL/dy values
              are summed into the slabs (duplicates ADD, exactly).
  B' (scatter): per (level, superblock): slab values scatter-add into the
              gradient block with the transposed one-hot matmul.

Cost per level per direction ~ O(batch*C*(S + cap*F)) for binning/combine
plus O(n_tiles*cap*S * R) ~= O(batch*C*R*waste) for the block matmuls -
vs O(batch*C*t_rows) dense. For t_rows=2^19 that is a ~40x MXU reduction.

Exactness: deterministic always. Overflow (more than `cap` DISTINCT table
rows hashed into one superblock by one tile's picks) drops that pick's
contribution; with cap=48 against a Poisson(16) bin load this happens with
probability ~2e-11 per bin (~1e-5 per step at batch 2^18) - far below the
reference's own atomicAdd float-nondeterminism, and duplicates (the
realistic concentration case) never overflow thanks to dedup. The XLA
oracle remains available via GridEncoding(impl="xla").

Reference semantics carried over exactly: grid_index / hash / uint32
wraparound and interpolation-weight math are the SAME routines as the
dense kernels (grid_kernel._positions / _corner_indices_and_weights),
cited to common_device.h:631-718 and grid.h:48-320.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import grid_kernel as gk

LANE = 128
#: smallest per-level table size the binned path accepts (below this the
#: dense VMEM-resident one-hot kernels win)
MIN_BINNED_ROWS = 1 << 14

#: kernel-A level-loop mode (VERDICT r3 item 3, compile time). The
#: unrolled per-level body is ~109 jaxpr eqns x NL levels (1288 total at
#: T=2^19) - the largest Mosaic program in the binned step and the prime
#: cold-compile suspect. "transpose": lax.fori_loop over levels, per-level
#: rows read from a [NL, G] VMEM scratch with pl.ds and converted by
#: [1,G]<->[G,1] transposes (the Mosaic-safest dynamic form; the rank
#: network already does one such transpose per level). "lane": dynamic
#: LANE-dim ref slicing (fewer ops, needs Mosaic dynamic lane offsets -
#: unverified on real v5e). "off": the measured round-2/3 unrolled kernel.
#: Flip via TCNN_BINNED_A_LOOP; numerics of all three modes are pinned
#: identical by tests/test_binned_kernel.py.
A_LOOP = os.environ.get("TCNN_BINNED_A_LOOP", "off")


@dataclasses.dataclass(frozen=True)
class BinnedPlan:
    """Plan for the binned path over a SUFFIX of equal-size levels.

    `sub` is a GridKernelPlan covering ONLY the binned levels (their packed
    table layout [NL*h, 128*F] is reused for repack/unpack), with
    level-local row offsets.
    """

    sub: gk.GridKernelPlan
    t_rows: int  # per-level table rows (identical across binned levels)
    s: int  # superblocks per level
    r_blocks: int  # 128-row blocks per superblock (R = r_blocks*128)
    cap: int  # slots per (tile, superblock)
    nt: int  # samples per batch tile (G = C*nt picks)
    #: opt-in: log_warning via jax.debug.callback when picks are dropped
    warn_drops: bool = False
    #: externally-indexed mode: per-pick table row indices AND interpolation
    #: weights arrive as kernel inputs ([B, C*NL] f32 each, col c*NL + l -
    #: the dense kernels' ext layout) instead of being derived from x
    #: in-kernel. Serves non-grid dense-table encodings (PPNG3's Q^D
    #: frequency grids, ppng_3.h:476-494); the caller owns the index
    #: bijection and must pack the table rows in the SAME index order
    #: (see ppng.py's Morton premix for why mixing matters).
    ext_iw: bool = False

    @property
    def n_levels(self):
        return self.sub.n_levels

    @property
    def f(self):
        return self.sub.f

    @property
    def g(self):  # picks per tile
        return self.sub.n_corners * self.nt

    @property
    def log2_s(self):
        return self.s.bit_length() - 1


def make_binned_plan(sub: gk.GridKernelPlan, t_rows: int) -> BinnedPlan | None:
    """Size the binned pipeline for equal-size (power-of-two) levels."""
    if t_rows < MIN_BINNED_ROWS or (t_rows & (t_rows - 1)) != 0:
        return None
    # Kernel A stores the row-block index as bf16 (hi5+1, exact only up to
    # 256), so r_blocks must stay <= 256: grow S with the table. S is
    # capped at 512, covering log2_hashmap_size <= 24 (the reference's
    # documented maximum, DOCUMENTATION.md); beyond that -> XLA fallback.
    # S starts at 64: the round-4 S x nt sweep (scripts/sweep_binned_a.py,
    # T=2^19 b=2^18 on v5e) measured kernel A at 24.9/25.6/33.4/42.3 ms
    # for S=64/128/256/512 at nt=512, full forward 98.7 -> 94.9 ms at
    # S=64 - smaller superblocks win until r_blocks hits its ceiling.
    s = 64
    while t_rows // (s * LANE) > 256:
        s *= 2
    if s > 512:
        return None
    r_blocks = t_rows // (s * LANE)
    c = sub.n_corners
    nt = max(2048 // c, 64)
    g = c * nt
    if g % 256 != 0:
        return None
    # lambda = G / S picks per (tile, superblock); cap covers a >13-sigma
    # Poisson tail (see module docstring)
    lam = max(g // s, 1)
    cap = min(2 * lam + 16, 127)
    return BinnedPlan(sub=sub, t_rows=t_rows, s=s, r_blocks=r_blocks,
                     cap=cap, nt=nt)


def make_ext_binned_plan(
    n_levels: int, t_rows: int, f: int, d: int, cap_scale: int = 3
) -> BinnedPlan | None:
    """BinnedPlan for NL equal-size dense tables indexed EXTERNALLY
    (ext_iw mode): the caller supplies per-pick row indices and weights.

    The synthetic sub-plan only provides shape/corner bookkeeping (its
    level constants are never read on the ext path). `cap_scale` widens
    the slot cap beyond the hash-uniform default: external index
    distributions (e.g. PPNG3's arcsine-warped quantization) are less
    uniform than a hash even after the caller's bit-mixing."""
    if t_rows < MIN_BINNED_ROWS or (t_rows & (t_rows - 1)) != 0:
        return None
    if t_rows > 1 << 22:  # f32-exact index transport + r_blocks cap
        return None
    from ...common import InterpolationType

    h = t_rows // LANE
    levels = tuple(
        gk._Level(1.0, t_rows, h, l * h, True, True, (0,) * d, (True,) * d)
        for l in range(n_levels)
    )
    sub = gk.GridKernelPlan(
        d=d,
        n_levels=n_levels,
        f=f,
        h_total=n_levels * h,
        levels=levels,
        hash_factors=(0,) * d,
        interpolation=InterpolationType.Linear,
        offsets=tuple(l * t_rows for l in range(n_levels)),
        batch_tile=1024,
    )
    bp = make_binned_plan(sub, t_rows)
    if bp is None:
        return None
    lam = max(bp.g // bp.s, 1)
    cap = min(cap_scale * lam + 16, 127)
    return dataclasses.replace(bp, ext_iw=True, cap=cap)


def _level_hashed(enc, l: int) -> bool:
    """True iff hashing is active at level l (grid_type Hash and the
    uint32-wrapping dense stride exceeds the table size - the exact
    `use_hash` condition of GridEncoding._grid_indices /
    common_device.h:690-707)."""
    hashed, _ = _level_index_class(enc, l)
    return hashed


def _level_wrap_degenerate(enc, l: int) -> bool:
    """True iff level l is UNHASHED only because the reference's uint32
    stride wrapped (common_device.h:697 note: `stride *= resolution`
    overflows at fine levels). The reference then indexes with the WRAPPED
    linear form - e.g. 2D T=2^19 scale 2.0 (the reference's DEFAULT
    config) levels 12-15 collapse to `pos0 + pos1*2^(l+4) mod 2^32` with
    the pos1 term partially or fully vanishing mod table size.

    These levels are admitted into the binned suffix: their index is a
    LOW-DIMENSIONAL CONTIGUOUS linear form, so the low-bit superblock key
    spreads spatially clustered batches across consecutive superblocks and
    duplicate rows (the common case - whole coordinate ranges alias one
    row) are deduplicated into one slot. Overflow needs inputs lattice-
    aligned to exact multiples of S grid cells at a >=2^16 resolution -
    adversarial; the runtime drop counter (warn_binned_drops /
    count_drops) detects it. Genuinely dense/tiled levels at the cap stay
    excluded (ADVICE r2: their 2-D correlated keys can exceed cap on
    ordinary clustered batches)."""
    hashed, wrap_degenerate = _level_index_class(enc, l)
    return (not hashed) and wrap_degenerate


def _level_index_class(enc, l: int) -> tuple[bool, bool]:
    """(hashing active, unhashed-only-because-uint32-stride-wrapped)."""
    from ..encodings.grid import GridType

    if GridType(enc.grid_type) != GridType.Hash:
        return False, False
    size = int(enc._sizes[l])
    res = int(enc._resolutions[l])
    stride = 1
    stride_true = 1  # unbounded-integer twin of the uint32 stride
    for _ in range(enc.n_dims_to_encode):
        if stride > size:
            break
        stride = (stride * res) & 0xFFFFFFFF
        stride_true *= res
    if size < stride:
        return True, False
    return False, stride != stride_true and size < stride_true


@dataclasses.dataclass(frozen=True)
class SplitPlan:
    """Dense-kernel prefix + binned suffix covering a full GridEncoding."""

    dense: gk.GridKernelPlan | None  # levels [0, l0) - VMEM one-hot kernels
    binned: BinnedPlan  # levels [l0, L) - equal-size large tables
    n_prefix_params: int
    n_prefix_levels: int


def split_plan_for(enc) -> SplitPlan | None:
    """Split an encoding into (dense prefix, binned suffix), or None.

    The binned suffix is the maximal run of trailing levels whose table
    size equals the max size (for HashGrid: every level that hit the
    2^log2_hashmap_size cap, grid.h:685-730) - identical power-of-two
    sizes are what lets one (level, superblock) grid serve them all.

    Levels qualify when HASHING is active (grid_type Hash and dense stride
    overflowing the table, common_device.h:690-707) - the Poisson overflow
    bound on `cap` assumes hash-uniform superblock keys - OR when hashing
    is inactive only because the uint32 stride WRAPPED (the reference's
    finest-level degeneracy; see _level_wrap_degenerate - the index is a
    contiguous low-dim linear form the low-bit keys spread well, and the
    reference's DEFAULT 2D/3D scale-2.0 T=2^19 config has four such
    levels). Other non-hashed levels (Tiled at the cap, or a dense level
    whose aligned size coincides with the max) stay excluded: their
    spatially correlated 2-D index structure can pile ordinary clustered
    batches into one superblock."""
    sizes = [int(s) for s in enc._sizes[: enc.n_levels]]
    max_size = max(sizes)
    if max_size < MIN_BINNED_ROWS or (max_size & (max_size - 1)) != 0:
        return None
    l0 = enc.n_levels
    while (
        l0 > 0
        and sizes[l0 - 1] == max_size
        and (_level_hashed(enc, l0 - 1) or _level_wrap_degenerate(enc, l0 - 1))
    ):
        l0 -= 1
    if l0 >= enc.n_levels:
        return None
    sub = gk.build_plan(enc, l0, enc.n_levels)
    if sub is None:
        return None
    bp = make_binned_plan(sub, max_size)
    if bp is None:
        return None
    if getattr(enc, "warn_binned_drops", False):
        bp = dataclasses.replace(bp, warn_drops=True)
    dense = None
    if l0 > 0:
        dense = gk.build_plan(enc, 0, l0)
        if dense is None or dense.h_total * LANE > gk.MAX_TABLE_ROWS:
            return None
    return SplitPlan(
        dense=dense,
        binned=bp,
        n_prefix_params=int(enc._offsets[l0]) * enc.n_features_per_level,
        n_prefix_levels=l0,
    )


def grid_encode_split(split: SplitPlan, params, x):
    """Full-encoding forward through dense-prefix + binned-suffix kernels;
    output columns are level-major (prefix levels first), matching the
    public layout. For stochastic interpolation, ONE full-width corner
    uniform draw is sliced across the sub-plans so chosen corners match
    the XLA path level-for-level."""
    n_pre = split.n_prefix_params
    l0 = split.n_prefix_levels
    u_pre = u_suf = None
    if split.binned.sub.stochastic:
        from ..encodings.grid import stochastic_uniforms

        u_full = stochastic_uniforms(
            x.shape[0], l0 + split.binned.n_levels
        )
        u_pre, u_suf = u_full[:, :l0], u_full[:, l0:]
    parts = []
    if split.dense is not None:
        parts.append(
            gk.grid_encode_pallas(split.dense, params[:n_pre], x, u=u_pre)
        )
    parts.append(grid_encode_binned(split.binned, params[n_pre:], x, u=u_suf))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=1)


def repack_binned(bp: BinnedPlan, params):
    """flat fp32 suffix params -> bf16 [NL*S*r_blocks, F*128], PERMUTED so
    that superblock k holds the rows {idx : idx & (S-1) == k} (low-bit
    superblock keys; see the key comment in _bin_kernel). For in-level row
    idx = a*S + k: packed[(l*S + k)*r_blocks + (a>>7), f*128 + (a&127)]."""
    NL, S, rb, F = bp.n_levels, bp.s, bp.r_blocks, bp.f
    R = rb * LANE
    t = params.reshape(NL, R, S, F)  # [l, a, k, f]
    t = jnp.swapaxes(t, 1, 2)  # [l, k, a, f]
    t = t.reshape(NL, S, rb, LANE, F)
    t = jnp.swapaxes(t, 3, 4)  # [l, k, a_hi, f, a_lo]
    return t.reshape(NL * S * rb, F * LANE).astype(jnp.bfloat16)


def unpack_binned_grads(bp: BinnedPlan, packed):
    """inverse of repack_binned: [NL*S*rb, F*128] f32 -> flat fp32."""
    NL, S, rb, F = bp.n_levels, bp.s, bp.r_blocks, bp.f
    t = packed.reshape(NL, S, rb, F, LANE)
    t = jnp.swapaxes(t, 3, 4)  # [l, k, a_hi, a_lo, f]
    t = t.reshape(NL, S, rb * LANE, F)
    t = jnp.swapaxes(t, 1, 2)  # [l, a, k, f]
    return t.reshape(-1)


# ---------------------------------------------------------------------------
# Kernel A: bin picks -> slabs (hi5+1, lo7) + per-pick ranks
# ---------------------------------------------------------------------------


_SUB = 256  # ranking subchunk size (rank values stay bf16/f32-exact)


def _per_subchunk_rows(row_vals, n_sub):
    """[1, G] -> [G, 256]: row block c broadcasts row_vals's subchunk-c
    slice, so every pick row sees its OWN subchunk's values in lanes.
    (The whole-G formulation keeps the VPU at full [2048, 256] tiles - the
    per-subchunk [256, *] version spent most of its time in op dispatch
    and tiny XLU transposes: 104 ms -> see git history.)"""
    return jnp.concatenate(
        [
            jnp.broadcast_to(row_vals[:, c * _SUB : (c + 1) * _SUB],
                             (_SUB, _SUB))
            for c in range(n_sub)
        ],
        axis=0,
    )


def _rank_level(idx_col, idx_row_l, onehot_k, n_sub, q_row, pos, key_mask):
    """Dedup-aware slot ranks for ALL picks of one level at once.

    idx_col [G, 1] i32; idx_row_l [1, G] i32 (same values, row form);
    onehot_k [G, S] f32; q_row [G, 256] f32 (lane position iota);
    pos [G, 1] f32 (own position within subchunk).
    Returns (rank [G, 1] f32, first [G, 1] f32).

    Picks compare only against their own 256-pick subchunk. Duplicates of
    the same table row share the slot opened by their FIRST occurrence, so
    a degenerate batch (all samples in one cell) uses 1 slot instead of
    overflowing. Elementwise only - no matmuls, no per-subchunk loops.
    """
    g = idx_col.shape[0]
    # NOTE: these rank networks must stay f32 - v5e Mosaic supports
    # neither bf16 comparisons ("Target does not support this comparison")
    # nor 32-bit bool masks feeding 16-bit selects (invalid relayout)
    rhs_idx = _per_subchunk_rows(idx_row_l, n_sub)  # [G, 256]
    eq = (idx_col == rhs_idx).astype(jnp.float32)
    # position of each pick's representative (first occurrence of its idx)
    qmin = jnp.min(jnp.where(eq > 0, q_row, float(_SUB)), axis=1,
                   keepdims=True)
    first = (qmin == pos).astype(jnp.float32)  # [G, 1]
    # rank = number of slots (first occurrences with the same superblock
    # key - equal idx implies equal key, so compare keys of the rhs rows)
    # opened strictly before the representative
    keq = ((idx_col & key_mask) == (rhs_idx & key_mask)).astype(jnp.float32)
    before = (q_row < qmin).astype(jnp.float32)
    open_rhs = _per_subchunk_rows(jnp.transpose(first), n_sub)  # [G, 256]
    r = jnp.sum(before * keq * open_rhs, axis=1, keepdims=True)  # [G, 1]
    # cross-subchunk slot offsets: exclusive cumsum of per-subchunk
    # distinct counts
    s = onehot_k.shape[1]
    fc = (onehot_k * first).reshape(n_sub, _SUB, s)
    counts = jnp.sum(fc, axis=1)  # [n_sub, S]
    # exclusive prefix sum over <= 8 subchunk rows (Mosaic has no cumsum)
    off_rows, run = [], jnp.zeros((1, s), jnp.float32)
    for c in range(n_sub):
        off_rows.append(run)
        run = run + counts[c : c + 1, :]
    offs = jnp.concatenate(off_rows, axis=0)  # [n_sub, S]
    offset_rhs = jnp.broadcast_to(offs[:, None, :], (n_sub, _SUB, s)).reshape(
        g, s
    )
    off_p = jnp.sum(onehot_k * offset_rhs, axis=1, keepdims=True)
    return r + off_p, first


def _stacked_level_indices(bp: BinnedPlan, x, cr, ext=None, extw=None):
    """Corner-stacked per-level indices and weights: idx [G, NL] i32,
    cw [G, NL] f32 (or None for Nearest). Same pick ordering (corner-major)
    everywhere (A, C, P). `ext` [nt, C*NL]: precomputed Rng-hash values
    (HashType.Rng, same contract as the dense kernels). In ext_iw mode
    `ext`/`extw` carry FINAL row indices (f32, exact to 2^22) and
    interpolation weights; x is ignored."""
    sub = bp.sub
    if bp.ext_iw:
        # ext/extw arrive [C, nt, NL] (see _ext_specs_args): the
        # corner-stack is a free leading-dim merge, not a lane-slice
        # row-concat (the Mosaic offset-mismatch hazard)
        NL = bp.n_levels
        idx = ext.reshape(-1, NL).astype(jnp.int32)  # [G, NL]
        cw = extw.reshape(-1, NL)
        return idx, cw
    cells, w = gk._positions(sub, x, cr)
    per_corner = gk._corner_indices_and_weights(sub, cells, w, cr, ext=ext)
    idx = jnp.concatenate([i for i, _ in per_corner], axis=0)  # [G, NL]
    if per_corner[0][1] is None:
        return idx, None
    cw = jnp.concatenate([c for _, c in per_corner], axis=0)
    return idx, cw


def _bin_kernel(x_ref, *rest, bp: BinnedPlan):
    ext_ref = extw_ref = None
    if bp.ext_iw:
        ext_ref, extw_ref = rest[0], rest[1]
        rest = rest[2:]
    elif bp.sub.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[: len(gk._CONST_NAMES)]
    # outputs, then (loop modes only) the two VMEM scratch refs
    sh_ref, sl_ref, rk_ref, dr_ref = rest[
        len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + 4
    ]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[0, 0] = jnp.float32(0.0)
    cr = {n: ref[:] for n, ref in zip(gk._CONST_NAMES, const_refs)}
    NL, S, cap, G = bp.n_levels, bp.s, bp.cap, bp.g

    idx_all, _ = _stacked_level_indices(
        bp, x_ref[:], cr,
        ext=ext_ref[:] if ext_ref is not None else None,
        extw=extw_ref[:] if extw_ref is not None else None,
    )
    idx_all_t = jnp.transpose(idx_all)  # [NL, G] - ONE transpose per tile
    # superblock key = LOW index bits (derived per level in level_slabs):
    # CoherentPrime's dim-0 factor is 1 (common_device.h:649), so at
    # coarse levels the hash's TOP bits are independent of cell_0 and
    # whole tiles would pile into a few superblocks (measured: cap
    # overflows at T=2^19 level 6). Low bits mix every dimension; the
    # table is stored permuted to match (repack_binned).
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)
    n_sub = G // _SUB
    q_row = jax.lax.broadcasted_iota(jnp.int32, (G, _SUB), 1).astype(
        jnp.float32
    )
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) & (_SUB - 1)
    ).astype(jnp.float32)

    def level_slabs(idx_col, idx_row_l):
        """One level's placement: (ph [S, cap] f32, plo, rank [G, 1] f32,
        n_drop scalar) from the level's pick indices ([G, 1] column and
        [1, G] row forms of the same values)."""
        k_col = idx_col & (bp.s - 1)
        lo_col = idx_col >> bp.log2_s
        onehot_k = (k_col == iota_s).astype(jnp.float32)  # [G, S]
        rank_col, first_col = _rank_level(
            idx_col, idx_row_l, onehot_k, n_sub, q_row, pos, bp.s - 1
        )
        # dropped-pick counter: rank >= cap has no slot column, so the
        # pick's contribution is lost in BOTH directions (C reads nothing,
        # P places nothing). Duplicates share their representative's rank,
        # so they are counted as dropped too - the count is exact.
        nd = jnp.sum((rank_col >= float(cap)).astype(jnp.float32))

        # placement: first occurrences write (hi5+1) and lo7 into their
        # (k, rank) slot; rank >= cap (overflow) has no one-hot column and
        # is dropped (see module docstring for the probability bound)
        ohrank = (rank_col.astype(jnp.int32) == iota_cap).astype(jnp.float32)
        ohrank_first = (ohrank * first_col).astype(jnp.bfloat16)
        ok_bf = onehot_k.astype(jnp.bfloat16)
        hvals = ((lo_col >> 7) + 1).astype(jnp.bfloat16)
        lvals = (lo_col & (LANE - 1)).astype(jnp.bfloat16)
        ph = jax.lax.dot_general(
            ok_bf, ohrank_first * hvals,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, cap]
        plo = jax.lax.dot_general(
            ok_bf, ohrank_first * lvals,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return ph, plo, rank_col, nd

    if A_LOOP != "off":
        # level fori_loop: the Mosaic program carries ONE level body
        # (~4x smaller at NL=10) instead of NL copies - the cold-compile
        # lever. idx rows live in VMEM scratch so the loop can slice them
        # at a traced level index. "transpose" touches only leading-dim
        # dynamic slices (+ [1,G]<->[G,1] transposes, a class the rank
        # network already uses per level); "lane" uses dynamic lane-dim
        # ref slicing instead.
        idxT_ref, aux_ref = rest[-2:]
        idxT_ref[:] = idx_all_t
        if A_LOOP == "lane":
            aux_ref[:] = idx_all  # [G, NL]

        def body(l, nd_acc):
            row = idxT_ref[pl.ds(l, 1), :]  # [1, G]
            if A_LOOP == "lane":
                idx_col = aux_ref[:, pl.ds(l, 1)]  # dynamic lane slice
            else:
                idx_col = jnp.transpose(row)
            ph, plo, rank_col, nd = level_slabs(idx_col, row)
            r0 = pl.multiple_of(l * S, S)
            sh_ref[0, pl.ds(r0, S), :] = ph.astype(jnp.bfloat16)
            sl_ref[0, pl.ds(r0, S), :] = plo.astype(jnp.bfloat16)
            if A_LOOP == "lane":
                rk_ref[:, pl.ds(l, 1)] = rank_col.astype(jnp.int32)
            else:  # rank rows -> [NL, G] scratch, one transpose at the end
                aux_ref[pl.ds(l, 1), :] = jnp.transpose(
                    rank_col.astype(jnp.int32)
                )
            return nd_acc + nd

        n_drop = jax.lax.fori_loop(0, NL, body, jnp.zeros((), jnp.float32))
        if A_LOOP != "lane":
            rk_ref[:] = jnp.transpose(aux_ref[:])
        dr_ref[0, 0] = dr_ref[0, 0] + n_drop
        return

    sh_rows, sl_rows, rk_cols = [], [], []
    n_drop = jnp.zeros((), jnp.float32)
    for l in range(NL):
        ph, plo, rank_col, nd = level_slabs(
            idx_all[:, l : l + 1], idx_all_t[l : l + 1, :]
        )
        rk_cols.append(rank_col.astype(jnp.int32))
        n_drop = n_drop + nd
        sh_rows.append(ph.astype(jnp.bfloat16))
        sl_rows.append(plo.astype(jnp.bfloat16))

    sh_ref[0] = jnp.concatenate(sh_rows, axis=0)  # [NL*S, cap]
    sl_ref[0] = jnp.concatenate(sl_rows, axis=0)
    rk_ref[:] = jnp.concatenate(rk_cols, axis=1)  # [G, NL]
    dr_ref[0, 0] = dr_ref[0, 0] + n_drop


def _eiw3(bp: BinnedPlan, eiw):
    """ext_iw operands in the corner-stacked [C, B, NL] kernel layout
    (see _ext_specs_args docstring), with the per-tile BlockSpec."""
    C, NL = bp.sub.n_corners, bp.n_levels
    b = eiw[0].shape[0]
    spec3 = pl.BlockSpec((C, bp.nt, NL), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM)
    return spec3, [a.reshape(b, C, NL).transpose(1, 0, 2) for a in eiw]


def _ext_specs_args(bp: BinnedPlan, x, eiw=None):
    """Optional extra kernel inputs: precomputed Rng-hash values
    (ext_hash), or external (row index, weight) pairs (ext_iw mode,
    `eiw` = (idx [B, C*NL] f32, cw [B, C*NL] f32)).

    ext_iw operands ship CORNER-STACKED as [C, B, NL] (one cheap XLA
    transpose out here), because slicing the flat [nt, C*NL] layout into
    per-corner lane windows and row-concatenating them is the Mosaic
    'offset mismatch on non-concat dimension' hazard - it compiled on the
    round-3 stack but fails layout inference inside grad-path programs on
    the current one (same context-dependence class as the A_LOOP modes,
    PERF.md round 4). The [C, nt, NL] block reshapes to [C*nt, NL] freely
    (leading-dim merge), matching the dense kernels' Rng ext layout."""
    w = bp.sub.n_corners * bp.n_levels
    if bp.ext_iw:
        spec3, args = _eiw3(bp, eiw)
        return [spec3, spec3], args
    if not bp.sub.ext_hash:
        return [], []
    spec = pl.BlockSpec((bp.nt, w), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return [spec], [gk.compute_ext_hash(bp.sub, x)]


def _bin_call(bp: BinnedPlan, x, eiw=None):
    n_tiles = x.shape[0] // bp.nt
    NL, S, cap, G = bp.n_levels, bp.s, bp.cap, bp.g
    consts = gk._plan_constants(bp.sub)
    ext_specs, ext_args = _ext_specs_args(bp, x, eiw)
    return pl.pallas_call(
        functools.partial(_bin_kernel, bp=bp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + ext_specs
        + gk._const_specs(consts),
        out_specs=[
            pl.BlockSpec((1, NL * S, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL * S, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, NL * S, cap), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_tiles, NL * S, cap), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_tiles * G, NL), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=(
            []
            if A_LOOP == "off"
            else [
                pltpu.VMEM((NL, G), jnp.int32),  # idx rows (level-major)
                pltpu.VMEM(
                    (G, NL) if A_LOOP == "lane" else (NL, G), jnp.int32
                ),  # lane: idx cols; transpose: rank rows
            ]
        ),
        compiler_params=gk._VMEM_LIMIT,
    )(x, *ext_args, *gk._const_args(consts))


# ---------------------------------------------------------------------------
# Kernel B: per-(level, superblock) compact gather from the table block
# ---------------------------------------------------------------------------


def _gather_kernel(sh_ref, sl_ref, tbl_ref, o_ref, *, bp: BinnedPlan,
                   n_tiles: int):
    """One (level, superblock): gather all slots' table rows.

    The per-slot one-hots for ALL cap slot columns are lane-concatenated
    into ONE [rb, cap*n_tiles] matrix so the gather is a single deep
    matmul (48 small serial matmuls measured ~4x slower). Slot rows come
    out j-major; a reshape+transpose (both Mosaic-supported) restores the
    [n_tiles, F*cap] output layout."""
    F, cap, rb = bp.f, bp.cap, bp.r_blocks
    sh = sh_ref[0]  # [n_tiles, cap] bf16 (hi5+1; 0 = empty)
    slo = sl_ref[0]
    tbl = tbl_ref[0]  # [rb, 128*F] bf16
    hT = jnp.transpose(sh.astype(jnp.float32))  # [cap, n_tiles]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rb, n_tiles), 0).astype(
        jnp.float32
    )
    # j-chunks bound the [jc*n_tiles, 128F] picked intermediate to ~4 MB
    jc = max(1, min(cap, 4096 // n_tiles))
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, LANE), 1).astype(
        jnp.float32
    )

    cols = [[] for _ in range(F)]
    for j0 in range(0, cap, jc):
        js = range(j0, min(j0 + jc, cap))
        ohT = jnp.concatenate(
            [
                (iota_r == hT[j : j + 1, :] - 1.0).astype(jnp.bfloat16)
                for j in js
            ],
            axis=1,
        )  # [rb, jc*n_tiles] (j-major lanes)
        picked = jax.lax.dot_general(
            ohT, tbl,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [jc*n_tiles, 128*F] (j-major rows)
        # per-j lane one-hots built full-width THEN row-concatenated
        # (row-concat of thin [N,1] columns at different lane offsets is a
        # Mosaic internal error)
        ohlo = jnp.concatenate(
            [
                (slo[:, j : j + 1].astype(jnp.float32) == lane_iota).astype(
                    jnp.float32
                )
                for j in js
            ],
            axis=0,
        )  # [jc*n_tiles, 128]
        for f in range(F):
            v = jnp.sum(picked[:, f * LANE : (f + 1) * LANE] * ohlo,
                        axis=1, keepdims=True)
            cols[f].append(
                jnp.transpose(v.reshape(len(js), n_tiles))
            )  # [n_tiles, jc]
    out = jnp.concatenate(
        [jnp.concatenate(cols[f], axis=1) for f in range(F)], axis=1
    )
    o_ref[0] = out.astype(jnp.bfloat16)


def _gather_call(bp: BinnedPlan, sh, sl, table_packed):
    """sh/sl arrive tile-major [n_tiles, NL*S, cap] from kernel A; the
    (l,s)-major relayout the gather grid needs is an XLA transpose (the
    TPU block-shape rules only allow slicing LEADING dims at size 1)."""
    n_tiles = sh.shape[0]
    NL, S, cap, F, rb = bp.n_levels, bp.s, bp.cap, bp.f, bp.r_blocks
    sh_t = jnp.swapaxes(sh, 0, 1)  # [NL*S, n_tiles, cap]
    sl_t = jnp.swapaxes(sl, 0, 1)
    tbl3 = table_packed.reshape(NL * S, rb, LANE * F)
    return pl.pallas_call(
        functools.partial(_gather_kernel, bp=bp, n_tiles=n_tiles),
        grid=(NL, S),
        in_specs=[
            pl.BlockSpec((1, n_tiles, cap), lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, cap), lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, LANE * F), lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tiles, F * cap),
                               lambda l, s: (l * S + s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NL * S, n_tiles, F * cap),
                                       jnp.bfloat16),
        compiler_params=gk._VMEM_LIMIT,
    )(sh_t, sl_t, tbl3)


# ---------------------------------------------------------------------------
# Kernel C: per-tile combine (read slots, weight, reduce corners)
# ---------------------------------------------------------------------------


def _combine_kernel(x_ref, rk_ref, feats_ref, *rest, bp: BinnedPlan):
    ext_ref = extw_ref = None
    if bp.ext_iw:
        ext_ref, extw_ref = rest[0], rest[1]
        rest = rest[2:]
    elif bp.sub.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[: len(gk._CONST_NAMES)]
    # output, then (loop modes only) the two VMEM scratch refs
    y_ref = rest[len(gk._CONST_NAMES)]
    cr = {n: ref[:] for n, ref in zip(gk._CONST_NAMES, const_refs)}
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    C, nt = bp.sub.n_corners, bp.nt

    idx_all, cw_all = _stacked_level_indices(
        bp, x_ref[:], cr,
        ext=ext_ref[:] if ext_ref is not None else None,
        extw=extw_ref[:] if extw_ref is not None else None,
    )
    k_all = idx_all & (bp.s - 1)
    ranks = rk_ref[:]  # [G, NL] i32
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)

    def combine_level(feats_l, k_col, rank_col, cw_col):
        """One level's picked feature columns: [G, 1] per f (slot read via
        the superblock one-hot matmul + rank lane-reduce, weight folded).
        feats_l: the level's [S, F*cap] bf16 gathered-slot slab."""
        onehot_k = (k_col == iota_s).astype(jnp.bfloat16)
        tmp = jnp.dot(onehot_k, feats_l,
                      preferred_element_type=jnp.float32)  # [G, F*cap]
        ohrank = (rank_col == iota_cap).astype(jnp.float32)
        out = []
        for f in range(F):
            v = jnp.sum(tmp[:, f * cap : (f + 1) * cap] * ohrank,
                        axis=1, keepdims=True)  # [G, 1]
            if cw_col is not None:
                v = v * cw_col
            out.append(v)
        return out

    if A_LOOP != "off":
        # same compile lever as kernels A/P; the picked matrix accumulates
        # as a fori_loop carry (each level adds its columns through an
        # iota lane mask - [G, NL*F] is a few vregs, so the masked adds
        # are noise next to the per-level matmul).
        idx_scr, w_scr = rest[len(gk._CONST_NAMES) + 1 :]
        lane = A_LOOP == "lane"
        if lane:
            idx_scr[:] = idx_all
        else:
            idx_scr[0:NL, :] = jnp.transpose(idx_all)
            idx_scr[NL : 2 * NL, :] = jnp.transpose(ranks)
        if cw_all is not None:
            w_scr[:] = cw_all if lane else jnp.transpose(cw_all)
        iota_nlf = jax.lax.broadcasted_iota(jnp.int32, (G, NL * F), 1)

        def body(l, picked):
            if lane:
                idx_col = idx_scr[:, pl.ds(l, 1)]
                rank_col = rk_ref[:, pl.ds(l, 1)]
            else:
                idx_col = jnp.transpose(idx_scr[pl.ds(l, 1), :])
                rank_col = jnp.transpose(idx_scr[pl.ds(NL + l, 1), :])
            cw_col = None
            if cw_all is not None:
                cw_col = (
                    w_scr[:, pl.ds(l, 1)] if lane
                    else jnp.transpose(w_scr[pl.ds(l, 1), :])
                )
            k_col = idx_col & (bp.s - 1)
            r0 = pl.multiple_of(l * S, S)
            vals = combine_level(
                feats_ref[0, pl.ds(r0, S), :], k_col, rank_col, cw_col
            )
            for f, v in enumerate(vals):
                picked = picked + jnp.where(iota_nlf == l * F + f, v, 0.0)
            return picked

        picked = jax.lax.fori_loop(
            0, NL, body, jnp.zeros((G, NL * F), jnp.float32)
        )
        y_ref[:] = (
            picked.reshape(C, nt, NL * F).sum(axis=0).astype(y_ref.dtype)
        )
        return

    cols = []
    for l in range(NL):
        cols.extend(
            combine_level(
                feats_ref[0, l * S : (l + 1) * S, :],
                k_all[:, l : l + 1], ranks[:, l : l + 1],
                cw_all[:, l : l + 1] if cw_all is not None else None,
            )
        )
    picked = jnp.concatenate(cols, axis=1)  # [G, NL*F] l-major f-minor
    y_ref[:] = picked.reshape(C, nt, NL * F).sum(axis=0).astype(y_ref.dtype)


def _combine_call(bp: BinnedPlan, x, ranks, feats, eiw=None):
    n_tiles = x.shape[0] // bp.nt
    feats = jnp.swapaxes(feats, 0, 1)  # -> tile-major [n_tiles, NL*S, F*cap]
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    consts = gk._plan_constants(bp.sub)
    ext_specs, ext_args = _ext_specs_args(bp, x, eiw)
    return pl.pallas_call(
        functools.partial(_combine_kernel, bp=bp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + ext_specs
        + gk._const_specs(consts),
        out_specs=pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], NL * F), jnp.bfloat16),
        scratch_shapes=(
            []
            if A_LOOP == "off"
            else [
                # lane: idx cols / transpose: idx rows + rank rows
                pltpu.VMEM(
                    (G, NL) if A_LOOP == "lane" else (2 * NL, G), jnp.int32
                ),
                pltpu.VMEM(
                    (G, NL) if A_LOOP == "lane" else (NL, G), jnp.float32
                ),  # interpolation weights
            ]
        ),
        compiler_params=gk._VMEM_LIMIT,
    )(x, ranks, feats, *ext_args, *gk._const_args(consts))


# ---------------------------------------------------------------------------
# Kernel P: backward value placement (w * dL/dy summed into slabs)
# ---------------------------------------------------------------------------


def _place_kernel(x_ref, rk_ref, gy_ref, *rest, bp: BinnedPlan):
    ext_ref = extw_ref = None
    if bp.ext_iw:
        ext_ref, extw_ref = rest[0], rest[1]
        rest = rest[2:]
    elif bp.sub.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    if bp.sub.stochastic:
        u_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[: len(gk._CONST_NAMES)]
    # output, then (loop modes only) the three VMEM scratch refs
    sv_ref = rest[len(gk._CONST_NAMES)]
    cr = {n: ref[:] for n, ref in zip(gk._CONST_NAMES, const_refs)}
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    C = bp.sub.n_corners
    D = bp.sub.d

    idx_all, cw_all = _stacked_level_indices(
        bp, x_ref[:], cr,
        ext=ext_ref[:] if ext_ref is not None else None,
        extw=extw_ref[:] if extw_ref is not None else None,
    )
    k_all = idx_all & (bp.s - 1)
    ranks = rk_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # [nt, NL*F] l-major f-minor
    gy_c = jnp.concatenate([gy] * C, axis=0)  # [G, NL*F]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)

    sel_c = None
    if bp.sub.stochastic:
        # single-corner scatter (grid.h:284-299): the chosen corner gets
        # the FULL dL/dy (weight 1); other corners contribute nothing. The
        # chosen corner's slot always exists (it was binned in A).
        _, w = gk._positions(bp.sub, x_ref[:], cr)
        u = u_ref[:]  # [nt, NL]
        u_dl = jnp.concatenate([u] * D, axis=1)
        bits = (u_dl < w).astype(jnp.int32)
        corner_id = None  # [nt, NL]
        for d in range(D):
            contrib = bits[:, d * NL : (d + 1) * NL] << d
            corner_id = contrib if corner_id is None else corner_id | contrib
        sel_c = jnp.concatenate(
            [
                (corner_id == c).astype(jnp.float32)
                for c in range(C)
            ],
            axis=0,
        )  # [G, NL]

    # per-pick scatter weights: the stochastic chosen-corner mask replaces
    # the interpolation weights (grid.h:284-299)
    w_all = sel_c if sel_c is not None else cw_all

    def place_level(k_col, rank_col, vals_f):
        """One level's slab [S, F*cap] from its key/rank columns and the
        already-weighted per-feature gy columns ([G, 1] each). Duplicate
        picks ADD in the dot_general, exactly."""
        ok_bf = (k_col == iota_s).astype(jnp.bfloat16)
        ohrank = (rank_col == iota_cap).astype(jnp.float32)
        per_f = [
            jax.lax.dot_general(
                ok_bf, (ohrank * v).astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, cap]
            for v in vals_f
        ]
        return jnp.concatenate(per_f, axis=1)  # [S, F*cap]

    if A_LOOP != "off":
        # same compile lever as kernel A: one level body in a fori_loop
        # instead of NL unrolled copies; level columns come from VMEM
        # scratch (transpose: level-major rows + [1,G]<->[G,1] transposes;
        # lane: dynamic lane-dim slicing).
        idx_scr, w_scr, gy_scr = rest[len(gk._CONST_NAMES) + 1 :]
        lane = A_LOOP == "lane"
        if lane:
            idx_scr[:] = idx_all  # [G, NL]; ranks read from rk_ref lanes
        else:
            # [2*NL, G]: idx rows, then rank rows
            idx_scr[0:NL, :] = jnp.transpose(idx_all)
            idx_scr[NL : 2 * NL, :] = jnp.transpose(ranks)
        if w_all is not None:
            w_scr[:] = w_all if lane else jnp.transpose(w_all)
        gy_scr[:] = gy_c if lane else jnp.transpose(gy_c)

        def body(l, _):
            if lane:
                idx_col = idx_scr[:, pl.ds(l, 1)]
                rank_col = rk_ref[:, pl.ds(l, 1)]
            else:
                idx_col = jnp.transpose(idx_scr[pl.ds(l, 1), :])
                rank_col = jnp.transpose(idx_scr[pl.ds(NL + l, 1), :])
            k_col = idx_col & (bp.s - 1)
            vals_f = []
            for f in range(F):
                if lane:
                    v = gy_scr[:, pl.ds(l * F + f, 1)]
                else:
                    v = jnp.transpose(gy_scr[pl.ds(l * F + f, 1), :])
                if w_all is not None:
                    if lane:
                        v = v * w_scr[:, pl.ds(l, 1)]
                    else:
                        v = v * jnp.transpose(w_scr[pl.ds(l, 1), :])
                vals_f.append(v)
            r0 = pl.multiple_of(l * S, S)
            sv_ref[0, pl.ds(r0, S), :] = place_level(
                k_col, rank_col, vals_f
            ).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, NL, body, 0)
        return

    rows = []
    for l in range(NL):
        vals_f = []
        for f in range(F):
            v = gy_c[:, l * F + f : l * F + f + 1]
            if w_all is not None:
                v = v * w_all[:, l : l + 1]
            vals_f.append(v)
        rows.append(
            place_level(k_all[:, l : l + 1], ranks[:, l : l + 1], vals_f)
        )
    sv_ref[0] = jnp.concatenate(rows, axis=0).astype(jnp.float32)


def _place_call(bp: BinnedPlan, x, ranks, gy, u=None, eiw=None):
    n_tiles = x.shape[0] // bp.nt
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    consts = gk._plan_constants(bp.sub)
    ext_specs, ext_args = _ext_specs_args(bp, x, eiw)
    u_specs, u_args = [], []
    if bp.sub.stochastic:
        u_specs = [pl.BlockSpec((bp.nt, NL), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)]
        u_args = [u]
    return pl.pallas_call(
        functools.partial(_place_kernel, bp=bp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + ext_specs
        + u_specs
        + gk._const_specs(consts),
        out_specs=pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, NL * S, F * cap),
                                       jnp.float32),
        scratch_shapes=(
            []
            if A_LOOP == "off"
            else [
                # lane: idx cols / transpose: idx rows + rank rows
                pltpu.VMEM(
                    (G, NL) if A_LOOP == "lane" else (2 * NL, G), jnp.int32
                ),
                pltpu.VMEM(
                    (G, NL) if A_LOOP == "lane" else (NL, G), jnp.float32
                ),  # scatter weights (cw or stochastic corner mask)
                pltpu.VMEM(
                    (G, NL * F) if A_LOOP == "lane" else (NL * F, G),
                    jnp.float32,
                ),  # corner-stacked gy
            ]
        ),
        compiler_params=gk._VMEM_LIMIT,
    )(x, ranks, gy, *ext_args, *u_args, *gk._const_args(consts))


# ---------------------------------------------------------------------------
# Kernel B': per-(level, superblock) compact scatter into gradient blocks
# ---------------------------------------------------------------------------


def _scatter_kernel(sh_ref, sl_ref, sv_ref, o_ref, *, bp: BinnedPlan,
                    n_tiles: int):
    F, cap, rb = bp.f, bp.cap, bp.r_blocks
    sh = sh_ref[0]  # [n_tiles, cap]
    slo = sl_ref[0]
    sv = sv_ref[0]  # [n_tiles, F*cap] f32
    hT = jnp.transpose(sh.astype(jnp.float32))  # [cap, n_tiles]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rb, n_tiles), 0).astype(
        jnp.float32
    )
    # j-chunks: one K-deep matmul per chunk instead of cap small ones
    jc = max(1, min(cap, 4096 // n_tiles))
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, LANE), 1).astype(
        jnp.float32
    )

    acc = jnp.zeros((rb, LANE * F), jnp.float32)
    for j0 in range(0, cap, jc):
        js = range(j0, min(j0 + jc, cap))
        ohT = jnp.concatenate(
            [
                (iota_r == hT[j : j + 1, :] - 1.0).astype(jnp.bfloat16)
                for j in js
            ],
            axis=1,
        )  # [rb, jc*n_tiles]
        # weighted lane one-hots built per (j, f) full-width then
        # row/lane-concatenated (thin-column concat is a Mosaic error)
        rhs = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        (
                            slo[:, j : j + 1].astype(jnp.float32) == lane_iota
                        ).astype(jnp.float32)
                        * sv[:, f * cap + j : f * cap + j + 1]
                        for j in js
                    ],
                    axis=0,
                )
                for f in range(F)
            ],
            axis=1,
        ).astype(jnp.bfloat16)  # [jc*n_tiles, 128*F]
        acc = acc + jax.lax.dot_general(
            ohT, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc


def _scatter_call(bp: BinnedPlan, sh, sl, sv):
    n_tiles = sh.shape[0]
    NL, S, cap, F, rb = bp.n_levels, bp.s, bp.cap, bp.f, bp.r_blocks
    sh_t = jnp.swapaxes(sh, 0, 1)  # [NL*S, n_tiles, cap]
    sl_t = jnp.swapaxes(sl, 0, 1)
    sv_t = jnp.swapaxes(sv, 0, 1)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, bp=bp, n_tiles=n_tiles),
        grid=(NL, S),
        in_specs=[
            pl.BlockSpec((1, n_tiles, cap), lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, cap), lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, F * cap),
                         lambda l, s: (l * S + s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, LANE * F),
                               lambda l, s: (l * S + s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NL * S, rb, LANE * F), jnp.float32),
        compiler_params=gk._VMEM_LIMIT,
    )(sh_t, sl_t, sv_t)
    return out.reshape(NL * S * rb, LANE * F)


# ---------------------------------------------------------------------------
# Input-gradient (dy_dx) path: kernel C-ig merges the slot-read combine
# with the P placement AND emits dL/dx (kernel_grid_backward +
# kernel_grid_backward_input parity for the binned levels, grid.h:214-349);
# its own vjp is the bwd-bwd combine below (grid.h:351-650 parity), so
# second-order (eikonal) training runs the binned Pallas path too.
# ---------------------------------------------------------------------------


def _stacked_terms(bp: BinnedPlan, x, cr, ext=None):
    """Corner-stacked per-level index/weight/derivative pieces for the ig
    kernels: (idx, cw [G, L]; dw list per dim of [G, L] = dW_c/dx_d;
    terms_stacked per (corner, dim) for Hessian reuse; deriv2_c [G, D*L]).
    Row order corner-major, same as _stacked_level_indices."""
    sub = bp.sub
    L, D = bp.n_levels, sub.d
    nt = x.shape[0]
    xx = jnp.concatenate(
        [jnp.broadcast_to(x[:, d : d + 1], (nt, L)) for d in range(D)],
        axis=1,
    )
    pos = xx * cr["scales"] + 0.5
    cell_f = jnp.floor(pos)
    fract = pos - cell_f
    cells = cell_f.astype(jnp.int32)
    from ...common import InterpolationType, smoothstep

    if sub.interpolation == InterpolationType.Smoothstep:
        w = smoothstep(fract)
        deriv = 6.0 * fract * (1.0 - fract) * cr["scales"]
        deriv2 = 6.0 * (1.0 - 2.0 * fract) * cr["scales"] * cr["scales"]
    else:
        w = fract
        deriv = jnp.broadcast_to(cr["scales"], fract.shape)
        deriv2 = jnp.zeros_like(fract)

    per_corner = gk._corner_indices_and_weights(
        sub, cells, w, cr, want_terms=True, ext=ext
    )
    C = sub.n_corners
    idx = jnp.concatenate([i for i, _, _ in per_corner], axis=0)  # [G, L]
    cw = jnp.concatenate([c for _, c, _ in per_corner], axis=0)
    deriv_c = jnp.concatenate([deriv] * C, axis=0)  # [G, D*L]
    deriv2_c = jnp.concatenate([deriv2] * C, axis=0)

    def _prod_excluding(terms, excl):
        out = None
        for d2 in range(D):
            if d2 in excl:
                continue
            out = terms[d2] if out is None else out * terms[d2]
        return out if out is not None else jnp.ones_like(terms[0])

    dw = []
    for d in range(D):
        parts = []
        for corner_i, (_, _, terms) in enumerate(per_corner):
            sgn = 1.0 if (corner_i >> d) & 1 else -1.0
            parts.append(sgn * _prod_excluding(terms, (d,)))
        dw.append(
            jnp.concatenate(parts, axis=0) * deriv_c[:, d * L : (d + 1) * L]
        )
    return idx, cw, dw, per_corner, deriv_c, deriv2_c, _prod_excluding


def _slot_read(bp: BinnedPlan, k_col, rank_col, feats_l, iota_s, iota_cap):
    """Per-pick feature values for one level from the gathered slot slab
    feats_l [S, F*cap]: returns list per f of [G, 1] f32 (unweighted)."""
    cap, F = bp.cap, bp.f
    onehot_k = (k_col == iota_s).astype(jnp.bfloat16)
    tmp = jnp.dot(onehot_k, feats_l, preferred_element_type=jnp.float32)
    ohrank = (rank_col == iota_cap).astype(jnp.float32)
    return [
        jnp.sum(tmp[:, f * cap : (f + 1) * cap] * ohrank, axis=1,
                keepdims=True)
        for f in range(F)
    ], ohrank


def _combine_ig_kernel(x_ref, rk_ref, feats_ref, gy_ref, *rest,
                       bp: BinnedPlan):
    if bp.sub.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[:-2]
    sv_ref, gx_ref = rest[-2], rest[-1]
    cr = {n: ref[:] for n, ref in zip(gk._CONST_NAMES, const_refs)}
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    C, nt, D = bp.sub.n_corners, bp.nt, bp.sub.d

    idx_all, cw_all, dw, per_corner, _, _, _ = _stacked_terms(
        bp, x_ref[:], cr, ext=ext_ref[:] if bp.sub.ext_hash else None
    )
    k_all = idx_all & (bp.s - 1)
    ranks = rk_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # [nt, NL*F] l-major f-minor
    gy_c = jnp.concatenate([gy] * C, axis=0)  # [G, NL*F]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)

    rows = []
    dot_cols = []  # per level: [G, 1] = sum_f feat * gy (unweighted feats)
    for l in range(NL):
        vals, ohrank = _slot_read(
            bp, k_all[:, l : l + 1], ranks[:, l : l + 1],
            feats_ref[0, l * S : (l + 1) * S, :], iota_s, iota_cap,
        )
        ok_bf = (k_all[:, l : l + 1] == iota_s).astype(jnp.bfloat16)
        per_f = []
        dot_l = None
        for f in range(F):
            gyf = gy_c[:, l * F + f : l * F + f + 1]
            t = vals[f] * gyf
            dot_l = t if dot_l is None else dot_l + t
            # placement (P): w * gy summed into slabs
            rhs = (ohrank * (gyf * cw_all[:, l : l + 1])).astype(jnp.bfloat16)
            per_f.append(
                jax.lax.dot_general(
                    ok_bf, rhs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        dot_cols.append(dot_l)
        rows.append(jnp.concatenate(per_f, axis=1))  # [S, F*cap]
    sv_ref[0] = jnp.concatenate(rows, axis=0).astype(jnp.float32)
    dot_all = jnp.concatenate(dot_cols, axis=1)  # [G, NL]

    gx_cols = []
    for d in range(D):
        contrib = dot_all * dw[d]  # [G, NL]
        gx_cols.append(jnp.sum(contrib, axis=1, keepdims=True))
    gx = jnp.concatenate(gx_cols, axis=1)  # [G, D]
    gx_ref[:] = gx.reshape(C, nt, D).sum(axis=0).astype(gx_ref.dtype)


def _combine_ig_call(bp: BinnedPlan, x, ranks, feats, gy):
    n_tiles = x.shape[0] // bp.nt
    feats_t = jnp.swapaxes(feats, 0, 1)  # [n_tiles, NL*S, F*cap]
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    consts = gk._plan_constants(bp.sub)
    ext_specs, ext_args = _ext_specs_args(bp, x)
    return pl.pallas_call(
        functools.partial(_combine_ig_kernel, bp=bp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + ext_specs
        + gk._const_specs(consts),
        out_specs=[
            pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, NL * S, F * cap), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], x.shape[1]), jnp.float32),
        ],
        compiler_params=gk._VMEM_LIMIT,
    )(x, ranks, feats_t, gy, *ext_args, *gk._const_args(consts))


def _combine_bwdbwd_kernel(x_ref, rk_ref, f1_ref, f2_ref, gy_ref, z_ref,
                           *rest, bp: BinnedPlan):
    """Second-order combine (the binned analog of grid_kernel's
    _bwd_bwd_kernel trio, grid.h:351-650): given cotangents
    (ct_gparams via f2 = gathered ct_table slots, z = dL2/d(gx)),
    emits ct_gy, the ct_params placement slabs (zw * gy), and ct_x
    (full Hessian incl. off-diagonal terms)."""
    if bp.sub.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[:-3]
    ct_gy_ref, sv2_ref, ct_x_ref = rest[-3:]
    cr = {n: ref[:] for n, ref in zip(gk._CONST_NAMES, const_refs)}
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    C, nt, D = bp.sub.n_corners, bp.nt, bp.sub.d
    L = NL

    idx_all, cw_all, dw, per_corner, deriv_c, deriv2_c, _prod_excluding = (
        _stacked_terms(
            bp, x_ref[:], cr, ext=ext_ref[:] if bp.sub.ext_hash else None
        )
    )
    k_all = idx_all & (bp.s - 1)
    ranks = rk_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # [nt, NL*F] l-major f-minor
    z = z_ref[:].astype(jnp.float32)  # [nt, D]
    gy_c = jnp.concatenate([gy] * C, axis=0)
    z_c = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.broadcast_to(z[:, d : d + 1], (nt, L)) for d in range(D)],
                axis=1,
            )
        ]
        * C,
        axis=0,
    )  # [G, D*L]
    zw = None  # [G, L] = sum_d z_d * dW_c/dx_d
    for d in range(D):
        t = z_c[:, d * L : (d + 1) * L] * dw[d]
        zw = t if zw is None else zw + t

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)

    rows = []
    ct_gy_cols = []  # per (l, f): [G, 1]
    dotf_cols, dotf2_cols = [], []
    for l in range(NL):
        feats1_l = f1_ref[0, l * S : (l + 1) * S, :]
        feats2_l = f2_ref[0, l * S : (l + 1) * S, :]
        vals1, ohrank = _slot_read(
            bp, k_all[:, l : l + 1], ranks[:, l : l + 1], feats1_l,
            iota_s, iota_cap,
        )
        vals2, _ = _slot_read(
            bp, k_all[:, l : l + 1], ranks[:, l : l + 1], feats2_l,
            iota_s, iota_cap,
        )
        ok_bf = (k_all[:, l : l + 1] == iota_s).astype(jnp.bfloat16)
        per_f = []
        dotf_l = dotf2_l = None
        for f in range(F):
            gyf = gy_c[:, l * F + f : l * F + f + 1]
            # ct_gy = picked(table)*zw + picked(ct_table)*W
            ct_gy_cols.append(
                vals1[f] * zw[:, l : l + 1] + vals2[f] * cw_all[:, l : l + 1]
            )
            t1 = vals1[f] * gyf
            t2 = vals2[f] * gyf
            dotf_l = t1 if dotf_l is None else dotf_l + t1
            dotf2_l = t2 if dotf2_l is None else dotf2_l + t2
            # ct_params placement: zw * gy
            rhs = (ohrank * (gyf * zw[:, l : l + 1])).astype(jnp.bfloat16)
            per_f.append(
                jax.lax.dot_general(
                    ok_bf, rhs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        dotf_cols.append(dotf_l)
        dotf2_cols.append(dotf2_l)
        rows.append(jnp.concatenate(per_f, axis=1))
    sv2_ref[0] = jnp.concatenate(rows, axis=0).astype(jnp.float32)

    ct_gy = jnp.concatenate(ct_gy_cols, axis=1)  # [G, NL*F] l-major f-minor
    ct_gy_ref[:] = (
        ct_gy.reshape(C, nt, NL * F).sum(axis=0).astype(ct_gy_ref.dtype)
    )

    dotf = jnp.concatenate(dotf_cols, axis=1)  # [G, NL]
    dotf2 = jnp.concatenate(dotf2_cols, axis=1)

    ct_x_cols = []
    for dp in range(D):
        hess = None  # [G, L] = sum_d z_d * d2W_c/dx_d dx_dp
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
                    parts.append(
                        sgn_d * sgn_p * _prod_excluding(terms, (d, dp))
                    )
                block = (
                    jnp.concatenate(parts, axis=0)
                    * deriv_c[:, d * L : (d + 1) * L]
                    * deriv_c[:, dp * L : (dp + 1) * L]
                )
            t = z_c[:, d * L : (d + 1) * L] * block
            hess = t if hess is None else hess + t
        contrib = dotf * hess + dotf2 * dw[dp]
        ct_x_cols.append(jnp.sum(contrib, axis=1, keepdims=True))
    ct_x = jnp.concatenate(ct_x_cols, axis=1)  # [G, D]
    ct_x_ref[:] = ct_x.reshape(C, nt, D).sum(axis=0).astype(ct_x_ref.dtype)


def _combine_bwdbwd_call(bp: BinnedPlan, x, ranks, feats1, feats2, gy, z):
    n_tiles = x.shape[0] // bp.nt
    f1_t = jnp.swapaxes(feats1, 0, 1)
    f2_t = jnp.swapaxes(feats2, 0, 1)
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    consts = gk._plan_constants(bp.sub)
    ext_specs, ext_args = _ext_specs_args(bp, x)
    slab = pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_combine_bwdbwd_kernel, bp=bp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            slab,
            slab,
            pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + ext_specs
        + gk._const_specs(consts),
        out_specs=[
            pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            slab,
            pl.BlockSpec((bp.nt, x.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], NL * F), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, NL * S, F * cap), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], x.shape[1]), jnp.float32),
        ],
        compiler_params=gk._VMEM_LIMIT,
    )(x, ranks, f1_t, f2_t, gy, z, *ext_args, *gk._const_args(consts))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _binned_ig_backward(bp, n_params, params, x, gy):
    """(gparams, gx) = the binned ig backward, as a DIFFERENTIABLE function
    (l-major f-minor gy). Mirror of grid_kernel._ig_backward over the
    binned machinery: A (bin) -> B (gather) -> C-ig (place + dL/dx) ->
    B' (scatter)."""
    table = repack_binned(bp, params)
    sh, sl, ranks, _ = _bin_call(bp, x)
    feats = _gather_call(bp, sh, sl, table)
    sv, gx = _combine_ig_call(bp, x, ranks, feats, gy.astype(jnp.float32))
    gpacked = _scatter_call(bp, sh, sl, sv)
    return unpack_binned_grads(bp, gpacked), gx


def _binned_ig_backward_fwd(bp, n_params, params, x, gy):
    return _binned_ig_backward(bp, n_params, params, x, gy), (params, x, gy)


def _binned_ig_backward_bwd(bp, n_params, res, cts):
    params, x, gy = res
    ct_gparams, z = cts
    table = repack_binned(bp, params)
    ct_table = repack_binned(bp, ct_gparams)
    sh, sl, ranks, _ = _bin_call(bp, x)
    feats1 = _gather_call(bp, sh, sl, table)
    feats2 = _gather_call(bp, sh, sl, ct_table)
    ct_gy, sv2, ct_x = _combine_bwdbwd_call(
        bp, x, ranks, feats1, feats2, gy.astype(jnp.float32),
        z.astype(jnp.float32),
    )
    gpacked2 = _scatter_call(bp, sh, sl, sv2)
    ct_params = unpack_binned_grads(bp, gpacked2)
    return (
        ct_params.astype(params.dtype),
        ct_x.astype(x.dtype),
        ct_gy.astype(gy.dtype),
    )


_binned_ig_backward.defvjp(_binned_ig_backward_fwd, _binned_ig_backward_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _binned_ig(bp, n_params, params, x):
    table_packed = repack_binned(bp, params)
    sh, sl, ranks, n_drop = _bin_call(bp, x)
    _maybe_warn(bp, n_drop)
    feats = _gather_call(bp, sh, sl, table_packed)
    return _combine_call(bp, x, ranks, feats)


def _binned_ig_fwd(bp, n_params, params, x):
    return _binned_ig(bp, n_params, params, x), (params, x)


def _binned_ig_bwd(bp, n_params, res, gy):
    params, x = res
    gparams, gx = _binned_ig_backward(bp, n_params, params, x, gy)
    return gparams, gx.astype(x.dtype)


_binned_ig.defvjp(_binned_ig_fwd, _binned_ig_bwd)


def grid_encode_binned_ig(bp: BinnedPlan, params, x):
    """Like grid_encode_binned but the backward ALSO produces dL/dx, and
    is itself differentiable (second-order via the bwd-bwd combine above;
    third order raises). Matches grid.h:171-211 (dy_dx) + :322-349
    (backward_input) + :902-1026 (backward_backward) for binned levels."""
    b = x.shape[0]
    nt = bp.nt
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    y = _binned_ig(bp, int(params.shape[0]), params, x)
    return y[:b]


def grid_encode_split_ig(split: SplitPlan, params, x):
    """Full-encoding forward over a SplitPlan whose backward produces
    dL/dx as well (dense-prefix ig kernels + binned-suffix ig path); the
    two parts' input gradients add automatically under vjp. Stochastic
    interpolation is not supported here (same as the dense ig path -
    input-gradient workloads use the exact scatter)."""
    n_pre = split.n_prefix_params
    parts = []
    if split.dense is not None:
        parts.append(gk.grid_encode_pallas_ig(split.dense, params[:n_pre], x))
    parts.append(grid_encode_binned_ig(split.binned, params[n_pre:], x))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _warn_on_drops(n_drop):
    n = int(n_drop)
    if n > 0:
        from ...log import log_warning

        log_warning(
            f"binned grid kernels dropped {n} pick contribution(s) this "
            "step (superblock cap overflow) - gradients are biased; see "
            "binned_kernel.py docstring / GridEncoding.count_binned_drops"
        )


def _maybe_warn(bp, n_drop):
    """Opt-in runtime overflow detection (warn_drops on the plan): a
    jax.debug.callback fires log_warning when any pick was dropped. Off by
    default - the callback forces a per-step D2H transfer of the scalar."""
    if bp.warn_drops:
        jax.debug.callback(_warn_on_drops, n_drop)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _binned(bp, n_params, params, x, u):
    table_packed = repack_binned(bp, params)
    sh, sl, ranks, n_drop = _bin_call(bp, x)
    _maybe_warn(bp, n_drop)
    feats = _gather_call(bp, sh, sl, table_packed)
    return _combine_call(bp, x, ranks, feats)


def _binned_fwd(bp, n_params, params, x, u):
    table_packed = repack_binned(bp, params)
    sh, sl, ranks, n_drop = _bin_call(bp, x)
    _maybe_warn(bp, n_drop)
    feats = _gather_call(bp, sh, sl, table_packed)
    y = _combine_call(bp, x, ranks, feats)
    return y, (x, sh, sl, ranks, u)


def _binned_bwd(bp, n_params, res, gy):
    x, sh, sl, ranks, u = res
    sv = _place_call(bp, x, ranks, gy.astype(jnp.float32), u=u)
    gpacked = _scatter_call(bp, sh, sl, sv)
    gparams = unpack_binned_grads(bp, gpacked)
    # dL/dx intentionally zero (same contract as grid_encode_pallas)
    return gparams, jnp.zeros_like(x), jnp.zeros_like(u)


_binned.defvjp(_binned_fwd, _binned_bwd)


def count_drops(split: SplitPlan, x) -> int:
    """Exact dropped-pick count for one batch through the binned suffix
    (the split-plan debug API): runs stage A alone and reads the overflow
    counter. 0 means the forward AND backward for this batch are exact to
    bf16 rounding; nonzero means cap overflow dropped that many
    (sample, corner, level) contributions. Rows added by tile padding are
    deduplicated to at most one slot per (subchunk, level), so they cannot
    themselves cause meaningful overflow."""
    bp = split.binned
    b = x.shape[0]
    padded = -(-b // bp.nt) * bp.nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    _, _, _, n_drop = _bin_call(bp, x)
    return int(jax.device_get(n_drop)[0, 0])


def grid_encode_binned(bp: BinnedPlan, params, x, u=None):
    """[B, D] fp32 -> [B, NL*F] bf16 for the binned (large-table) levels.
    Pads the batch to the tile size and trims; backward produces table
    gradients only. `u` [B, NL]: per-(sample, level) corner uniforms for
    stochastic interpolation (grid_encode_split slices them from the
    full-width draw so corners match the XLA path level-for-level)."""
    b = x.shape[0]
    nt = bp.nt
    padded = -(-b // nt) * nt
    if bp.sub.stochastic:
        if u is None:
            from ..encodings.grid import stochastic_uniforms

            u = stochastic_uniforms(b, bp.n_levels)
        if padded != b:
            u = jnp.pad(u, ((0, padded - b), (0, 0)), constant_values=2.0)
    else:
        u = jnp.zeros((1, 1), jnp.float32)  # unused placeholder
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    y = _binned(bp, int(params.shape[0]), params, x, u)
    return y[:b]


# ---------------------------------------------------------------------------
# Externally-indexed mode (ext_iw): dense-table lookup for PPNG3 et al.
# ---------------------------------------------------------------------------


def _ext_dummy_x(arr):
    """Placeholder x input for ext_iw kernels (loaded, never read)."""
    return jnp.zeros((arr.shape[0], 1), jnp.float32)


def _combine_extg_kernel(rk_ref, feats_ref, gy_ref, ei_ref, ew_ref, *out_refs,
                         bp: BinnedPlan, want_sv: bool):
    """Ext-mode gradient combine: per-pick feature-gy dot products (the
    d_cw cotangent - the ext analog of grid.h:322-349's dL_dy*dy_dx
    contraction) and, optionally, the cw-weighted placement slabs (P)."""
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    C = bp.sub.n_corners
    idx_all, cw_all = _stacked_level_indices(
        bp, None, None, ext=ei_ref[:], extw=ew_ref[:]
    )
    k_all = idx_all & (bp.s - 1)
    ranks = rk_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # [nt, NL*F] l-major f-minor
    gy_c = jnp.concatenate([gy] * C, axis=0)  # [G, NL*F]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (G, cap), 1)

    rows, dot_cols = [], []
    for l in range(NL):
        vals, ohrank = _slot_read(
            bp, k_all[:, l : l + 1], ranks[:, l : l + 1],
            feats_ref[0, l * S : (l + 1) * S, :], iota_s, iota_cap,
        )
        ok_bf = (k_all[:, l : l + 1] == iota_s).astype(jnp.bfloat16)
        per_f = []
        dot_l = None
        for f in range(F):
            gyf = gy_c[:, l * F + f : l * F + f + 1]
            t = vals[f] * gyf
            dot_l = t if dot_l is None else dot_l + t
            if want_sv:
                rhs = (ohrank * (gyf * cw_all[:, l : l + 1])).astype(
                    jnp.bfloat16
                )
                per_f.append(
                    jax.lax.dot_general(
                        ok_bf, rhs,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
        dot_cols.append(dot_l)
        if want_sv:
            rows.append(jnp.concatenate(per_f, axis=1))  # [S, F*cap]
    if want_sv:
        out_refs[0][0] = jnp.concatenate(rows, axis=0).astype(jnp.float32)
    out_refs[-1][:] = jnp.concatenate(dot_cols, axis=1)  # [G, NL]


def _combine_extg_call(bp: BinnedPlan, ranks, feats, gy, eiw, want_sv=True):
    n_tiles = gy.shape[0] // bp.nt
    feats_t = jnp.swapaxes(feats, 0, 1)  # [n_tiles, NL*S, F*cap]
    NL, S, cap, F, G = bp.n_levels, bp.s, bp.cap, bp.f, bp.g
    eiw_spec, eiw_args = _eiw3(bp, eiw)
    out_specs = [
        pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n_tiles * G, NL), jnp.float32)]
    if want_sv:
        out_specs.insert(
            0,
            pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape.insert(
            0,
            jax.ShapeDtypeStruct((n_tiles, NL * S, F * cap), jnp.float32),
        )
    res = pl.pallas_call(
        functools.partial(_combine_extg_kernel, bp=bp, want_sv=want_sv),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((G, NL), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL * S, F * cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp.nt, NL * F), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            eiw_spec,
            eiw_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=gk._VMEM_LIMIT,
    )(ranks, feats_t, gy, *eiw_args)
    return res if want_sv else (None, res[0])


def _dots_to_cw(bp: BinnedPlan, dots):
    """[n_tiles*G, NL] corner-major pick dots -> [B, C*NL] ext layout."""
    C, nt, NL = bp.sub.n_corners, bp.nt, bp.n_levels
    n_tiles = dots.shape[0] // bp.g
    return (
        dots.reshape(n_tiles, C, nt, NL)
        .transpose(0, 2, 1, 3)
        .reshape(n_tiles * nt, C * NL)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _binned_ext_backward(bp, params, idx, cw, gy):
    """(d_table_flat, d_cw) = backward of the ext lookup, as a
    DIFFERENTIABLE function (second order; the ext analog of
    _binned_ig_backward, cf. ppng_3.h:14-230's grad/grad_grad helpers)."""
    table = repack_binned(bp, params)
    xd = _ext_dummy_x(idx)
    sh, sl, ranks, _ = _bin_call(bp, xd, eiw=(idx, cw))
    feats = _gather_call(bp, sh, sl, table)
    sv, dots = _combine_extg_call(bp, ranks, feats, gy, (idx, cw))
    gpacked = _scatter_call(bp, sh, sl, sv)
    return unpack_binned_grads(bp, gpacked), _dots_to_cw(bp, dots)


def _binned_ext_backward_fwd(bp, params, idx, cw, gy):
    return _binned_ext_backward(bp, params, idx, cw, gy), (params, idx, cw, gy)


def _binned_ext_backward_bwd(bp, res, cts):
    """VJP of the backward. With y = sum_picks cw*T[idx] and
    (dT, dcw) = (scatter(cw*gy), dot(T[idx], gy)), the cotangent algebra
    is closed over the same five kernels:
      ct_gy     = combine(ct_dT[idx], cw) + combine(T[idx], ct_dcw)
      ct_params = scatter(ct_dcw * gy)
      ct_cw     = dot(ct_dT[idx], gy)
    (third order is out of scope, as in the reference)."""
    params, idx, cw, gy = res
    ct_dtable, ct_dcw = cts
    xd = _ext_dummy_x(idx)
    table = repack_binned(bp, params)
    ct_table = repack_binned(bp, ct_dtable)
    sh, sl, ranks, _ = _bin_call(bp, xd, eiw=(idx, cw))
    feats1 = _gather_call(bp, sh, sl, table)
    feats2 = _gather_call(bp, sh, sl, ct_table)
    t1 = _combine_call(bp, xd, ranks, feats2, eiw=(idx, cw))
    t2 = _combine_call(bp, xd, ranks, feats1, eiw=(idx, ct_dcw))
    ct_gy = t1.astype(jnp.float32) + t2.astype(jnp.float32)
    sv = _place_call(bp, xd, ranks, gy.astype(jnp.float32),
                     eiw=(idx, ct_dcw))
    ct_params = unpack_binned_grads(bp, _scatter_call(bp, sh, sl, sv))
    _, dots = _combine_extg_call(bp, ranks, feats2, gy, (idx, cw),
                                 want_sv=False)
    return (
        ct_params.astype(params.dtype),
        jnp.zeros_like(idx),
        _dots_to_cw(bp, dots).astype(cw.dtype),
        ct_gy.astype(gy.dtype),
    )


_binned_ext_backward.defvjp(_binned_ext_backward_fwd, _binned_ext_backward_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _binned_ext(bp, params, idx, cw):
    table = repack_binned(bp, params)
    sh, sl, ranks, n_drop = _bin_call(bp, _ext_dummy_x(idx), eiw=(idx, cw))
    _maybe_warn(bp, n_drop)
    feats = _gather_call(bp, sh, sl, table)
    return _combine_call(bp, _ext_dummy_x(idx), ranks, feats, eiw=(idx, cw))


def _binned_ext_fwd(bp, params, idx, cw):
    return _binned_ext(bp, params, idx, cw), (params, idx, cw)


def _binned_ext_bwd(bp, res, gy):
    params, idx, cw = res
    gparams, gcw = _binned_ext_backward(
        bp, params, idx, cw, gy.astype(jnp.float32)
    )
    return gparams.astype(params.dtype), jnp.zeros_like(idx), gcw.astype(
        cw.dtype
    )


_binned_ext.defvjp(_binned_ext_fwd, _binned_ext_bwd)


def binned_ext_lookup(bp: BinnedPlan, params, idx, cw):
    """Differentiable multi-table lookup with EXTERNAL per-pick rows and
    weights (ext_iw plans from make_ext_binned_plan).

    params: flat [NL * t_rows * F] fp32, row-major per level in the SAME
    index order the caller uses for `idx` (premix any bit-mixing into both).
    idx [B, C*NL] f32 level-local rows (col c*NL + l), cw [B, C*NL] f32
    weights. Returns [B, NL*F] bf16, l-major f-minor. Gradients flow to
    params and cw (first AND second order); idx gets zeros.
    """
    b = idx.shape[0]
    padded = -(-b // bp.nt) * bp.nt
    if padded != b:
        idx = jnp.pad(idx, ((0, padded - b), (0, 0)))
        cw = jnp.pad(cw, ((0, padded - b), (0, 0)))
    y = _binned_ext(bp, params, idx, cw)
    return y[:b]


def count_ext_drops(bp: BinnedPlan, idx, cw) -> int:
    """Exact dropped-pick count for one batch in ext_iw mode (the
    count_drops analog for externally-indexed tables)."""
    b = idx.shape[0]
    padded = -(-b // bp.nt) * bp.nt
    if padded != b:
        idx = jnp.pad(idx, ((0, padded - b), (0, 0)))
        cw = jnp.pad(cw, ((0, padded - b), (0, 0)))
    _, _, _, n_drop = _bin_call(bp, _ext_dummy_x(idx), eiw=(idx, cw))
    return int(jax.device_get(n_drop)[0, 0])
