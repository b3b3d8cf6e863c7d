"""Fully-fused training-step Pallas kernel: grid -> MLP -> loss -> backward.

The reference's claim to fame is fusing the MLP into one kernel
(src/fully_fused_mlp.cu); its training step still runs ~6 kernels per step
(grid fwd, MLP fwd, loss, MLP bwd dgrad, per-layer wgrad GEMMs, grid
scatter; trainer.h:163-190). On TPU we can go further: this kernel executes
the ENTIRE model forward + loss + backward for a batch tile in one Pallas
program -

    grid gather (one-hot MXU matmuls, tables VMEM-resident)
    -> fused MLP forward (weights VMEM-resident)
    -> elementwise loss value + gradient (the tcnn loss family)
    -> fused MLP backward (dgrad chain + wgrad accumulation)
    -> grid scatter (one-hot^T MXU matmuls into a VMEM-resident
       gradient table)

with the expensive per-sample index math and the per-level one-hot
matrices computed ONCE and shared between the gather and the scatter
(the separate-kernel formulation recomputes all of it in the backward),
and no HBM round-trips for the encoding output, activations, or loss
gradients. The corner interpolation weights are folded into the lane
one-hots (ohlo_w), so the weighted gather-pick and the weighted scatter
share the same cached masks.

Outputs: per-tile loss-value partial sums, the MLP weight gradients and the
packed grid-table gradients, both accumulated across batch tiles in VMEM -
deterministic, unlike the reference's atomicAdd scatter.

Used by the Trainer when the model is grid + FullyFusedMLP with an
elementwise loss (data_pdf and max_level coarse-to-fine supported;
perturbation_sigma and external dL_doutput fall back); the composed
per-op path remains the general fallback (identical math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import Activation
from ..activations import activation_bwd_out, activation_fn
from . import grid_kernel as gk

LANE = 128

#: fused-kernel scheduling knobs, overridable for tuning sweeps
#: (scripts/probe_r3_headline.py). nt = max(batch_tile // FUSED_TILE_DIV,
#: 128); RECOMPUTE_MASKS=True drops the cached per-level one-hot masks
#: between gather and scatter and rebuilds them (more VPU work, ~14 MB less
#: VMEM at nt=256 - lets bigger tiles fit for better MXU efficiency).
FUSED_TILE_DIV = 4
RECOMPUTE_MASKS = False
#: lane-pick formulation (scripts/ablate_pick_v3.py analysis: 4 of the ~8
#: per-level VPU passes are thin-column broadcasts/reduces):
#:   "base"  per-level weight-folded lane masks (round-2 production form)
#:   "cwend" unweighted 0/1 masks; the interpolation weight is applied as
#:           ONE wide [C*Nt, F*L] multiply after the pick (and folded into
#:           the cotangent before the scatter) - drops the per-level thin
#:           cw broadcasts. Encoding columns run f-major in-kernel, with
#:           the first MLP weight's rows permuted to match (free).
#:   "v3b"   cwend + the pick reduce runs on the MXU: per level, the
#:           lane-masked gather block (exact bf16 table entries) hits a
#:           [128F, F*L] selection matmul accumulated into [C*Nt, F*L] -
#:           no thin-column reduces or lane concats at all.
#: All three are mathematically identical (same products, same sums).
PICK_VARIANT = "base"
#: batch tile for the forward-only fused kernel (fused_forward). 0 = use
#: plan.batch_tile. The inference kernel has no scatter/cached-mask VMEM,
#: so tiles larger than the train-shared plan tile can win - swept by
#: bench.py's autotune alongside the other knobs.
INFER_TILE = 0
#: pick variant for the forward-only kernel ("" = PICK_VARIANT): with no
#: scatter the VMEM/VPU trade differs, so its winner can diverge from the
#: train kernel's (round-3 bench: train v3b, inference cwend). Keeping
#: them separate lets one process run both at their own winners.
INFER_VARIANT = ""

#: These module globals are the process-wide defaults; a per-model
#: override travels as Trainer.schedule (ops.pallas.schedule.Schedule),
#: which the Trainer applies around its traced calls.


def _fused_plan_for(model):
    """Shared shape gate for every fused kernel: grid+FFMLP model, no Sine,
    and a dense kernel plan. Returns the plan, or None when any fused
    kernel must fall back to the composed path."""
    from ...models.mlp import FullyFusedMLP
    from ...models.network_with_input_encoding import NetworkWithInputEncoding
    from ...ops.encodings.grid import GridEncoding

    if not isinstance(model, NetworkWithInputEncoding):
        return None
    if not isinstance(model.encoding, GridEncoding):
        return None
    mlp = model.network
    if not isinstance(mlp, FullyFusedMLP):
        return None
    if Activation.Sine in (mlp.activation, mlp.output_activation):
        return None
    return model.encoding._kernel_plan()


def _table_bytes(plan):
    return plan.h_total * 128 * plan.f * 2  # bf16 packed table


def _cached_mask_bytes(plan, c_nt):
    """All levels' (oh bf16, ohlo f32) masks held live across phases."""
    return c_nt * plan.h_total * 2 + c_nt * 128 * plan.n_levels * 4


def _transient_mask_bytes(plan, c_nt):
    """Pipelined builds: ~2 levels of (oh, ohlo) live at once."""
    h_max = max(lvl.h for lvl in plan.levels)
    return 2 * c_nt * h_max * 2 + 2 * c_nt * 128 * 4


def supported(model, loss, perturbation_sigma: float = 0.0) -> bool:
    """Whether the fused train kernel covers this (model, loss) config.
    perturbation_sigma and external dL_doutput are handled in-kernel (the
    noise / cotangent arrive as inputs), so they no longer gate."""
    from ...ops.losses import Loss

    if not isinstance(loss, Loss):
        return False
    plan = _fused_plan_for(model)
    if plan is None:
        return False
    # VMEM estimate: the fused kernel caches the per-level one-hot masks
    # between gather and scatter (not needed for the stochastic scatter,
    # which builds chosen-corner masks, nor under RECOMPUTE_MASKS, which
    # rebuilds them) - for big tables that dominates and the composed
    # kernels (which recompute) are the right path. MUST stay consistent
    # with the knobs fused_train_grads actually runs with.
    try:
        variant = _resolve_variant(plan)
    except ValueError:
        return False  # unknown PICK_VARIANT -> composed fallback
    nt = max(plan.batch_tile // FUSED_TILE_DIV, 128)
    c_nt = plan.n_corners * nt
    mask_bytes = (
        _transient_mask_bytes(plan, c_nt)
        if plan.stochastic or RECOMPUTE_MASKS
        else _cached_mask_bytes(plan, c_nt)
    )
    gtable_bytes = plan.h_total * 128 * plan.f * 4
    # v3b materializes lo_b [C*Nt, 128L] f32 AND the i1 mask_all (Mosaic
    # lays i1 out in 32-bit lanes): 8 bytes/elem while both are live
    mask_all_bytes = (
        8 * c_nt * 128 * plan.n_levels if variant == "v3b" else 0
    )
    est = mask_bytes + _table_bytes(plan) + gtable_bytes + mask_all_bytes
    return est < 70 * 1024 * 1024


def supported_infer(model) -> bool:
    """Whether the forward-only fused kernel covers this model AT THE
    CURRENT KNOBS. The infer kernel's footprint differs from the train
    kernel's (no gtable, masks transient, tile = INFER_TILE or the full
    plan tile). The module-global knobs are process defaults; a Trainer
    with a per-model Schedule applies it around this gate, so two models
    in one process each gate at their own tile/variant."""
    plan = _fused_plan_for(model)
    if plan is None:
        return False
    try:
        variant = _resolve_variant(plan, infer=True)
    except ValueError:
        return False
    nt = INFER_TILE or plan.batch_tile
    c_nt = plan.n_corners * nt
    # masks are transient in the forward (pipelined builds, ~2 levels live)
    # stacked index math: hi/lo i32 [C*Nt, L] + cw f32
    idx_bytes = c_nt * plan.n_levels * 4 * 3
    # v3b: lo_b f32 + i1 mask_all (32-bit lanes) live together, plus the
    # picked accumulator
    mask_all_bytes = (
        8 * c_nt * 128 * plan.n_levels if variant == "v3b" else 0
    )
    picked_bytes = c_nt * plan.f * plan.n_levels * 4
    est = (_transient_mask_bytes(plan, c_nt) + idx_bytes
           + _table_bytes(plan) + mask_all_bytes + picked_bytes)
    return est < 70 * 1024 * 1024


def _resolve_variant(plan, infer: bool = False) -> str:
    """The pick variant actually used for this plan: Nearest has no
    interpolation weights, so the weight-at-the-end variants reduce to
    base (and the wrapper must agree with the kernel on the enc layout).
    The forward-only kernel (infer=True) uses INFER_VARIANT when set."""
    from ...common import InterpolationType

    if plan.interpolation == InterpolationType.Nearest:
        return "base"
    v = (INFER_VARIANT or PICK_VARIANT) if infer else PICK_VARIANT
    if v not in ("base", "cwend", "v3b"):
        raise ValueError(f"unknown PICK_VARIANT {v!r}")
    return v


def _pick_consts(plan):
    """v3b constant operands: E [L, 128L] bf16 lane-expansion
    (E[l, l*128+j] = 1), iota [1, 128L] f32 (j % 128), S [L*128F, F*L]
    bf16 selection (S[l*128F + f*128 + j, f*L + l] = 1)."""
    import numpy as np

    L, F = plan.n_levels, plan.f
    E = np.zeros((L, L * LANE), np.float32)
    for l in range(L):
        E[l, l * LANE : (l + 1) * LANE] = 1.0
    iota = np.tile(np.arange(LANE, dtype=np.float32), L)[None, :]
    S = np.zeros((L * LANE * F, F * L), np.float32)
    for l in range(L):
        for f in range(F):
            S[l * LANE * F + f * LANE : l * LANE * F + (f + 1) * LANE,
              f * L + l] = 1.0
    return (
        jnp.asarray(E, jnp.bfloat16),
        jnp.asarray(iota, jnp.float32),
        jnp.asarray(S, jnp.bfloat16),
    )


def _fm_row_perm(plan, in_pad):
    """Row permutation applying the kernel's f-major (f*L + l) encoding
    layout to the first MLP weight: W0_fm = W0[perm, :]. perm maps each
    f-major position to its public (l-major f-minor) source row; padding
    rows stay in place. Returns (perm, inv_perm) as numpy index arrays."""
    import numpy as np

    L, F = plan.n_levels, plan.f
    perm = np.asarray(
        [l * F + f for f in range(F) for l in range(L)]
        + list(range(L * F, in_pad)),
        np.int32,
    )
    inv = np.empty_like(perm)
    inv[perm] = np.arange(in_pad, dtype=np.int32)
    return perm, inv


def _masks_for(variant, plan, hi_cl, lo_cl, cw_cl, mask_all, l, h):
    """One level's (hi one-hot bf16, lane mask). base: weight-folded f32
    mask (delegates to the composed kernels' gk._level_masks so the two
    paths cannot diverge). cwend: unweighted f32 0/1 mask. v3b: the
    precomputed bool lane-mask slice (from the E-matmul)."""
    if variant == "base":
        return gk._level_masks(plan, hi_cl, lo_cl, cw_cl, l, h, None)
    rows = hi_cl.shape[0]
    oh = (
        hi_cl[:, l : l + 1]
        == jax.lax.broadcasted_iota(jnp.int32, (rows, h), 1)
    ).astype(jnp.bfloat16)
    if variant == "v3b":
        return oh, mask_all[:, l * LANE : (l + 1) * LANE]
    lmask = lo_cl[:, l : l + 1] == jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANE), 1
    )
    return oh, lmask.astype(jnp.float32)


def _v3b_mask_all(lo_cl, e_ref, iota_ref):
    """Lane masks for ALL levels from one bf16 expansion matmul + one wide
    f32 compare (lo <= 127 is bf16-exact): [C*Nt, 128L] i1."""
    lo_b = jnp.dot(
        lo_cl.astype(jnp.bfloat16), e_ref[:],
        preferred_element_type=jnp.float32,
    )
    return lo_b == iota_ref[:]


def _v3b_pick(picked_acc, g, ohlo, s_ref, l, F):
    """Accumulate one level's lane-masked pick on the MXU via the
    selection matmul. Masked rows are single bf16 table entries -> the
    bf16 cast is exact. Bool selects run per 128-lane feature slice and
    the f32 results are concatenated: lane-concat of i1 masks is a Mosaic
    relayout hazard (v5e bf16-lane-op class)."""
    gm = jnp.concatenate(
        [
            jnp.where(ohlo, g[:, f * LANE : (f + 1) * LANE], 0.0)
            for f in range(F)
        ],
        axis=1,
    ).astype(jnp.bfloat16)
    return picked_acc + jnp.dot(
        gm, s_ref[l * LANE * F : (l + 1) * LANE * F, :],
        preferred_element_type=jnp.float32,
    )


def _level_active(plan, l, max_level):
    """Static coarse-to-fine gate (grid.h:69-92 semantics: level zeroed when
    level >= max_level * n_levels + 1e-3). max_level is a python float, so
    masked levels are skipped AT TRACE TIME - clamping levels also removes
    their compute, which the reference's early-return achieves at runtime."""
    if max_level is None:
        return True
    return l < max_level * plan.n_levels + 1e-3


def _kernel(
    x_ref,
    t_ref,
    table_ref,
    *rest,
    plan,
    mlp,
    loss,
    loss_scale,
    n_weights,
    enc_pad,
    n_valid,
    max_level,
    has_pdf,
    has_noise,
    has_ext_dl,
    recompute,
    variant,
):
    n_w = n_weights
    stochastic = plan.stochastic
    if variant == "v3b":
        e_ref, iota_ref, s_ref = rest[:3]
        rest = rest[3:]
    const_refs = rest[:len(gk._CONST_NAMES)]
    w_refs = rest[len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + n_w]
    pos = len(gk._CONST_NAMES) + n_w
    pdf_ref = None
    if has_pdf:
        pdf_ref = rest[pos]
        pos += 1
    noise_ref = None
    if has_noise:
        noise_ref = rest[pos]
        pos += 1
    u_ref = None
    if stochastic:
        u_ref = rest[pos]
        pos += 1
    ext_ref = None
    if plan.ext_hash:
        ext_ref = rest[pos]
        pos += 1
    out_refs = rest[pos:]
    gtable_ref = out_refs[0]
    gw_refs = out_refs[1 : 1 + n_w]
    loss_ref = out_refs[1 + n_w]

    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)
        for gw in gw_refs:
            gw[:] = jnp.zeros_like(gw)
        loss_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:]
    nt = x.shape[0]
    F, C, L = plan.f, plan.n_corners, plan.n_levels

    # ---- shared index math (once for gather AND scatter) -------------------
    cells, w = gk._positions(plan, x, cr)
    # HashType.Rng: precomputed PCG32 hashes arrive [C, Nt, L]
    # (compute_ext_hash_stacked); leading-dim merge -> corner-stacked rows
    ext_s = (
        ext_ref[:].reshape(-1, L) if plan.ext_hash else None
    )
    hi_cl, lo_cl, cw_cl = gk._stacked_hi_lo_w_v2(plan, cells, w, cr,
                                                 ext=ext_s)

    # v3b: lane masks for ALL levels at once, instead of L thin-column
    # broadcasts
    mask_all = (
        _v3b_mask_all(lo_cl, e_ref, iota_ref) if variant == "v3b" else None
    )

    def _build(l, level):
        """One level's (hi one-hot, lane mask); the gather pick and the
        scatter rhs share the mask (weight-folded for base, 0/1 for
        cwend, bool slice for v3b)."""
        return _masks_for(variant, plan, hi_cl, lo_cl, cw_cl, mask_all,
                          l, level.h)

    # ---- grid gather (forward) ---------------------------------------------
    # the one-hot build (VPU) for level l+1 is emitted BEFORE level l's
    # matmul+pick so the VLIW scheduler can pack VPU build work under the
    # MXU gather of the previous level (measured: see PERF.md round 3)
    ohs = [None] * L
    ohlo_ws = [None] * L
    cols = {}  # (l, f) -> [C*Nt, 1] pick column (base / cwend)
    picked_acc = (
        jnp.zeros((C * nt, F * L), jnp.float32) if variant == "v3b" else None
    )
    built = {}
    active = [
        l for l, _ in enumerate(plan.levels)
        if _level_active(plan, l, max_level)
    ]
    if active:
        built[active[0]] = _build(active[0], plan.levels[active[0]])
    for i, l in enumerate(active):
        if i + 1 < len(active):
            nl = active[i + 1]
            built[nl] = _build(nl, plan.levels[nl])
        oh, ohlo = built.pop(l)
        level = plan.levels[l]
        keep = not (stochastic or recompute)
        ohs[l] = oh if keep else None
        ohlo_ws[l] = ohlo if keep else None
        tbl = table_ref[level.row_off : level.row_off + level.h, :]
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        if variant == "v3b":
            picked_acc = _v3b_pick(picked_acc, g, ohlo, s_ref, l, F)
        else:
            for f in range(F):
                cols[(l, f)] = jnp.sum(
                    g[:, f * LANE : (f + 1) * LANE] * ohlo,
                    axis=1,
                    keepdims=True,
                )

    fm = variant != "base"  # f-major (f*L + l) enc columns in-kernel
    if variant == "v3b":
        picked = picked_acc
    else:
        zero_col = (
            jnp.zeros((C * nt, 1), jnp.float32)
            if len(active) != L
            else None
        )
        order = (
            [(l, f) for f in range(F) for l in range(L)]
            if fm
            else [(l, f) for l in range(L) for f in range(F)]
        )
        picked = jnp.concatenate(
            [cols.get(lf, zero_col) for lf in order], axis=1
        )
    if fm and cw_cl is not None:
        # interpolation weights applied as ONE wide multiply (cwend/v3b)
        picked = picked * jnp.concatenate([cw_cl] * F, axis=1)
    enc = picked.reshape(C, nt, L * F).sum(axis=0)  # [Nt, L*F] f32
    if enc_pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((nt, enc_pad), enc.dtype)], axis=1
        )

    # ---- fused MLP forward --------------------------------------------------
    h = enc.astype(jnp.bfloat16)
    hs = [h]
    for i in range(n_w):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        h = activation_fn(z, act).astype(jnp.bfloat16)
        hs.append(h)

    if has_ext_dl:
        # external dL_doutput mode (trainer.h:127-131): the caller supplies
        # the output cotangent directly (t_ref carries it); no loss
        g = t_ref[:].astype(jnp.float32)
        loss_ref[0, 0] = jnp.float32(0.0)
    else:
        # ---- loss value + gradient (tcnn-exact elementwise family) ------
        pred = hs[-1].astype(jnp.float32)  # [Nt, out_pad]
        if noise_ref is not None:
            # output perturbation (logistic noise, trainer.h:114-121),
            # precomputed with the SAME rng as the composed path
            pred = pred + noise_ref[:].astype(jnp.float32)
        targets = t_ref[:].astype(jnp.float32)
        pdf = (
            pdf_ref[:].astype(jnp.float32)
            if pdf_ref is not None
            else jnp.ones_like(targets)
        )
        values, grad = loss.value_and_grad_fn(pred, targets, pdf)
        # mask rows beyond the true batch (batch padded to the tile size);
        # normalization to the true batch happens in the wrapper
        row = jax.lax.broadcasted_iota(jnp.int32, (nt, 1), 0)
        valid = (row + pl.program_id(0) * nt < n_valid).astype(jnp.float32)
        values = values * valid
        grad = grad * valid
        loss_ref[0, 0] = loss_ref[0, 0] + jnp.sum(values)
        g = grad * loss_scale  # [Nt, out_pad] f32

    # ---- fused MLP backward -------------------------------------------------
    # the MLP matmuls are tiny next to the grid's (64-wide vs table-sized),
    # so the backward runs in f32 - same cotangent precision as the XLA
    # autodiff path (the standalone mlp_kernel uses bf16 cotangents like the
    # reference's __half; here f32 is free)
    for i in reversed(range(n_w)):
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        g = activation_bwd_out(g, hs[i + 1].astype(jnp.float32), act)
        gw_refs[i][:] = gw_refs[i][:] + jax.lax.dot_general(
            hs[i].astype(jnp.float32),
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = jax.lax.dot_general(
            g,
            w_refs[i][:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    genc = g[:, : L * F]  # [Nt, L*F] f32 (drop the zero-pad columns)

    if stochastic:
        # single-corner scatter (grid.h:284-299): chosen-corner index with
        # dynamic per-sample bits, M=Nt matmuls - 2^D x cheaper
        D = plan.d
        u = u_ref[:]  # [Nt, L]
        u_dl = jnp.concatenate([u] * D, axis=1)
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
        if ext_s is not None:
            # chosen corner's precomputed Rng hash: select among the C
            # corner-stacked row blocks of ext_s (row slices of the
            # leading dim - identical layouts, legal)
            corner_id = None  # [Nt, L]
            for d in range(D):
                contrib = bits[:, d * L : (d + 1) * L] << d
                corner_id = (
                    contrib if corner_id is None else corner_id | contrib
                )
            hxor = None
            for c in range(C):
                sel = jnp.where(
                    corner_id == c, ext_s[c * nt : (c + 1) * nt, :], 0
                )
                hxor = sel if hxor is None else hxor | sel
        raw = jnp.where(cr["hash_mask"] == 1, hxor, csum)
        idx_and = raw & cr["size_m1"]
        fraw = raw.astype(jnp.float32)
        idx_fmod = (
            fraw - jnp.floor(fraw / cr["size_f"]) * cr["size_f"]
        ).astype(jnp.int32)
        sidx = jnp.where(cr["pow2_mask"] == 1, idx_and, idx_fmod)
        shi = sidx >> 7
        slo = sidx & (LANE - 1)
        lane_iota_nt = jax.lax.broadcasted_iota(jnp.int32, (nt, LANE), 1)
        for l, level in enumerate(plan.levels):
            if not _level_active(plan, l, max_level):
                continue
            oh1 = (
                shi[:, l : l + 1]
                == jax.lax.broadcasted_iota(jnp.int32, (nt, level.h), 1)
            ).astype(jnp.bfloat16)
            ohlo1 = (slo[:, l : l + 1] == lane_iota_nt).astype(jnp.float32)
            s_cols = []
            for f in range(F):
                c0 = f * L + l if fm else l * F + f
                s_cols.append(ohlo1 * genc[:, c0 : c0 + 1])
            rhs = jnp.concatenate(s_cols, axis=1).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                oh1, rhs,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sl = slice(level.row_off, level.row_off + level.h)
            gtable_ref[sl, :] = gtable_ref[sl, :] + contrib
        return

    gy_c = jnp.concatenate([genc] * C, axis=0)  # [C*Nt, L*F]
    if fm and cw_cl is not None:
        # cwend/v3b: weights folded into the cotangent with ONE wide
        # multiply (the lane masks are unweighted)
        gy_c = gy_c * jnp.concatenate([cw_cl] * F, axis=1)

    # ---- grid scatter (reusing oh / ohlo_w when cached) --------------------
    # max_level-clamped levels keep zero gradients: only `active` scatters.
    # Like the gather loop, the VPU work for level l+1 (mask rebuild in
    # recompute mode + the rhs expansion) is emitted BEFORE level l's
    # scatter matmul so the VLIW scheduler can hide it under the MXU.
    def _scatter_operands(l):
        if ohs[l] is not None:
            oh_l, ohlo_l = ohs[l], ohlo_ws[l]
        else:  # recompute mode: rebuild from the (small, live) hi/lo/cw
            oh_l, ohlo_l = _build(l, plan.levels[l])
        rhs_cols = []
        for f in range(F):
            c0 = f * L + l if fm else l * F + f
            gcol = gy_c[:, c0 : c0 + 1]
            if variant == "v3b":  # ohlo_l is a bool lane mask
                rhs_cols.append(jnp.where(ohlo_l, gcol, 0.0))
            else:
                rhs_cols.append(ohlo_l * gcol)
        rhs = jnp.concatenate(rhs_cols, axis=1).astype(jnp.bfloat16)
        return oh_l, rhs

    pend = {}
    if active:
        pend[active[0]] = _scatter_operands(active[0])
    for i, l in enumerate(active):
        if i + 1 < len(active):
            nl = active[i + 1]
            pend[nl] = _scatter_operands(nl)
        oh_l, rhs = pend.pop(l)
        level = plan.levels[l]
        contrib = jax.lax.dot_general(
            oh_l,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(level.row_off, level.row_off + level.h)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib


def _infer_kernel(x_ref, table_ref, *rest, plan, mlp, n_weights, enc_pad,
                  variant):
    if variant == "v3b":
        e_ref, iota_ref, s_ref = rest[:3]
        rest = rest[3:]
    if plan.ext_hash:
        ext_ref = rest[0]
        rest = rest[1:]
    const_refs = rest[: len(gk._CONST_NAMES)]
    w_refs = rest[len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + n_weights]
    y_ref = rest[len(gk._CONST_NAMES) + n_weights]
    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    x = x_ref[:]
    nt = x.shape[0]
    F, C, L = plan.f, plan.n_corners, plan.n_levels

    cells, w = gk._positions(plan, x, cr)
    ext_s = (
        ext_ref[:].reshape(-1, L) if plan.ext_hash else None
    )
    hi_cl, lo_cl, cw_cl = gk._stacked_hi_lo_w_v2(plan, cells, w, cr,
                                                 ext=ext_s)

    mask_all = (
        _v3b_mask_all(lo_cl, e_ref, iota_ref) if variant == "v3b" else None
    )

    def _build(l, level):
        return _masks_for(variant, plan, hi_cl, lo_cl, cw_cl, mask_all,
                          l, level.h)

    fm = variant != "base"
    cols = []
    picked_acc = (
        jnp.zeros((C * nt, F * L), jnp.float32) if variant == "v3b" else None
    )
    nxt = _build(0, plan.levels[0])
    for l, level in enumerate(plan.levels):
        oh, ohlo = nxt
        if l + 1 < L:
            nxt = _build(l + 1, plan.levels[l + 1])
        tbl = table_ref[level.row_off : level.row_off + level.h, :]
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        if variant == "v3b":
            picked_acc = _v3b_pick(picked_acc, g, ohlo, s_ref, l, F)
        else:
            for f in range(F):
                cols.append(
                    jnp.sum(
                        g[:, f * LANE : (f + 1) * LANE] * ohlo,
                        axis=1,
                        keepdims=True,
                    )
                )
    if variant == "v3b":
        picked = picked_acc
    elif fm:
        # cwend collected (l, f) l-major; emit f-major columns
        picked = jnp.concatenate(
            [cols[l * F + f] for f in range(F) for l in range(L)], axis=1
        )
    else:
        picked = jnp.concatenate(cols, axis=1)
    if fm and cw_cl is not None:
        # interpolation weights applied as ONE wide multiply (cwend/v3b)
        picked = picked * jnp.concatenate([cw_cl] * F, axis=1)
    enc = picked.reshape(C, nt, L * F).sum(axis=0)
    if enc_pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((nt, enc_pad), enc.dtype)], axis=1
        )

    h = enc.astype(jnp.bfloat16)
    for i in range(n_weights):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        act = mlp.output_activation if i == n_weights - 1 else mlp.activation
        h = activation_fn(z, act).astype(jnp.bfloat16)
    y_ref[:] = h.astype(y_ref.dtype)


def fused_forward(model, params, x):
    """Inference-only fused grid+MLP forward: [B, D] -> [B, out_pad] bf16.
    Not differentiable (use the composed path or fused_train_grads for
    gradients)."""
    plan = model.encoding._kernel_plan()
    mlp = model.network
    enc = model.encoding
    n_net = mlp.n_params
    enc_pad = enc.padded_output_width - plan.out_width
    net_p, enc_p = params[:n_net], params[n_net:]
    table_packed = gk.repack_table(plan, enc_p)
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16))
        off += r * c
    variant = _resolve_variant(plan, infer=True)
    if variant != "base":
        perm, _ = _fm_row_perm(plan, int(wts[0].shape[0]))
        wts[0] = wts[0][perm, :]

    b = x.shape[0]
    nt = INFER_TILE or plan.batch_tile
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    consts = gk._plan_constants(plan)
    out_w = mlp.padded_output_width
    ext_specs, ext_args = gk._ext_specs_args(plan, x, nt=nt, stacked=True)
    pick_args = list(_pick_consts(plan)) if variant == "v3b" else []
    pick_specs = [
        pl.BlockSpec(a.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for a in pick_args
    ]

    y = pl.pallas_call(
        functools.partial(
            _infer_kernel, plan=plan, mlp=mlp, n_weights=len(wts),
            enc_pad=enc_pad, variant=variant,
        ),
        grid=(padded // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + pick_specs
        + ext_specs
        + gk._const_specs(consts)
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=pl.BlockSpec(
            (nt, out_w), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, out_w), jnp.bfloat16),
        compiler_params=gk._VMEM_LIMIT,
    )(x, table_packed, *pick_args, *ext_args, *gk._const_args(consts), *wts)
    return y[:b]


def fused_train_grads(model, loss, params, x, targets, loss_scale, pdf=None,
                      noise=None, ext_dl=False):
    """(loss_value_sum, grads_flat) for a NetworkWithInputEncoding(grid,
    FullyFusedMLP) model - one Pallas kernel per batch tile.

    noise: optional [B, out_pad] output perturbation added before the loss
    (trainer.h:114-121). ext_dl: `targets` IS the external dL_doutput
    [B, out_pad] (trainer.h:127-131) - no loss is computed, the returned
    loss sum is 0, and gradients are raw per-sample sums (no 1/n_total)."""
    plan = model.encoding._kernel_plan()
    max_level = model.encoding.max_level
    mlp = model.network
    enc = model.encoding
    n_net = mlp.n_params
    enc_pad = enc.padded_output_width - plan.out_width

    net_p, enc_p = params[:n_net], params[n_net:]
    table_packed = gk.repack_table(plan, enc_p)
    # transposed bf16 weights [fan_in, fan_out] (mlp_kernel convention)
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16))
        off += r * c
    n_w = len(wts)
    variant = _resolve_variant(plan)
    w0_inv = None
    if variant != "base":
        # the kernel's enc columns are f-major: permute W0's rows to match
        # (free at trace time); gw0 is unpermuted below
        perm, w0_inv = _fm_row_perm(plan, int(wts[0].shape[0]))
        wts[0] = wts[0][perm, :]

    b = x.shape[0]
    # the fused kernel keeps per-level oh/ohlo_w masks alive between the
    # gather and the scatter, so it runs a smaller batch tile than the
    # standalone grid kernels. Measured on v5e (config_hash, b=2^18):
    # tile 1024 OOMs VMEM (~126 MB), 512 -> 38.8 ms, 256 -> 34.8 ms (best:
    # live masks fit comfortably and pipeline), 128 -> 38.4 ms.
    # RECOMPUTE_MASKS trades the cached masks for a rebuild in the scatter,
    # freeing VMEM for bigger tiles (sweep via FUSED_TILE_DIV).
    recompute = RECOMPUTE_MASKS
    nt = max(plan.batch_tile // FUSED_TILE_DIV, 128)
    padded = -(-b // nt) * nt
    out_dims = targets.shape[1]
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
        targets = jnp.pad(targets, ((0, padded - b), (0, 0)))
        if pdf is not None:
            pdf = jnp.pad(pdf, ((0, padded - b), (0, 0)), constant_values=1.0)
        if noise is not None:
            noise = jnp.pad(noise, ((0, padded - b), (0, 0)))

    consts = gk._plan_constants(plan)
    grid_steps = padded // nt

    kern = functools.partial(
        _kernel,
        plan=plan,
        mlp=mlp,
        loss=loss,
        loss_scale=loss_scale,
        n_weights=n_w,
        enc_pad=enc_pad,
        n_valid=b,
        max_level=max_level,
        has_pdf=pdf is not None,
        has_noise=noise is not None,
        has_ext_dl=ext_dl,
        recompute=recompute,
        variant=variant,
    )

    pick_args = list(_pick_consts(plan)) if variant == "v3b" else []
    pick_specs = [
        pl.BlockSpec(a.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for a in pick_args
    ]
    in_specs = (
        [
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, out_dims), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + pick_specs
        + gk._const_specs(consts)
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ]
        + (
            [pl.BlockSpec((nt, out_dims), lambda g: (g, 0),
                          memory_space=pltpu.VMEM)]
            if pdf is not None
            else []
        )
    )
    out_specs = (
        [
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ]
        + [pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((plan.h_total, LANE * plan.f), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    )

    extra_args = []
    if pdf is not None:
        extra_args.append(pdf)
    if noise is not None:
        extra_args.append(noise)
        in_specs = in_specs + [
            pl.BlockSpec((nt, noise.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
        ]
    if plan.stochastic:
        # per-(sample, level) corner uniforms from the SHARED helper (drawn
        # over the true batch, padded) so the chosen corners match the XLA
        # and standalone-Pallas paths exactly
        extra_args.append(gk.stochastic_u_padded(b, padded, plan.n_levels))
        in_specs = in_specs + [
            pl.BlockSpec(
                (nt, plan.n_levels), lambda g: (g, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    if plan.ext_hash:
        # HashType.Rng: PCG32 hashes precomputed outside the kernel
        # (elementwise XLA), corner-stacked layout [C, B, L]
        ext_specs, ext_args = gk._ext_specs_args(plan, x, nt=nt,
                                                 stacked=True)
        extra_args.extend(ext_args)
        in_specs = in_specs + ext_specs
    outs = pl.pallas_call(
        kern,
        grid=(grid_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=gk._VMEM_LIMIT,
    )(x, targets, table_packed, *pick_args, *gk._const_args(consts), *wts,
      *extra_args)

    gtable = outs[0]
    gwts = outs[1 : 1 + n_w]
    if w0_inv is not None:
        gwts = [gwts[0][w0_inv, :]] + list(gwts[1:])
    loss_sum = outs[1 + n_w][0, 0]

    # the elementwise loss family normalizes by n_total = batch*dims using
    # the PER-TILE batch (nt); rescale everything to the true global batch
    # (padded rows were masked to zero in-kernel). External-dL gradients
    # are raw per-sample sums - no renormalization.
    scale = 1.0 if ext_dl else nt / b
    total = loss_sum * scale

    genc = gk.unpack_table_grads(plan, gtable, int(enc_p.shape[0]))
    gnet = jnp.concatenate([g.T.reshape(-1) for g in gwts])
    grads = jnp.concatenate([gnet, genc]).astype(jnp.float32) * scale
    return total, grads


# ---------------------------------------------------------------------------
# Fused input-gradient path: model forward whose backward runs MLP bwd +
# grid scatter + dL/dx in ONE kernel (the megakernel analog of the
# composed grid_encode_pallas_ig + XLA-MLP route; grid.h:171-211 dy_dx +
# :322-349 backward_input at fused-kernel speed)
# ---------------------------------------------------------------------------


def supported_ig(model, compute_dtype=None) -> bool:
    """Whether the fused input-gradient path covers this model: same
    shape/VMEM envelope as the train kernel, minus the loss, plus the
    composed-ig contract (no stochastic/nearest/max_level)."""
    from ...common import COMPUTE_DTYPE, InterpolationType

    if compute_dtype is not None and compute_dtype != COMPUTE_DTYPE:
        return False
    plan = _fused_plan_for(model)
    if plan is None:
        return False
    enc = model.encoding
    if not getattr(enc, "fast_input_grads", False):
        return False
    if enc.stochastic_interpolation or enc.max_level is not None:
        return False
    if enc.interpolation == InterpolationType.Nearest:
        return False
    # VMEM estimate for the ig kernel's OWN schedule - it ignores the
    # train-kernel knobs: fixed tile nt = batch_tile//4, always caches
    # every level's one-hot masks (shared between gather, scatter and the
    # dy_dx contraction), base pick variant (no mask_all / lo_b). Gating
    # on supported()'s knob-dependent estimate would both admit configs
    # the ig kernel blows past (RECOMPUTE_MASKS charges only 2 transient
    # levels) and reject ones it runs fine (v3b charges mask_all bytes
    # the ig kernel never materializes).
    nt = max(plan.batch_tile // 4, 128)
    c_nt = plan.n_corners * nt
    gtable_bytes = plan.h_total * 128 * plan.f * 4
    est = _cached_mask_bytes(plan, c_nt) + _table_bytes(plan) + gtable_bytes
    return est < 70 * 1024 * 1024


def _ig_kernel(x_ref, gy_ref, table_ref, *rest, plan, mlp, n_weights,
               enc_pad):
    """Recomputed grid+MLP forward, MLP backward with external output
    cotangent, grid scatter, and dL/dx - one program per batch tile. The
    per-level one-hot masks and the unweighted corner picks are shared
    between the gather, the scatter, and the dy_dx contraction."""
    from .grid_kernel import InterpolationType, smoothstep

    n_w = n_weights
    const_refs = rest[: len(gk._CONST_NAMES)]
    w_refs = rest[len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + n_w]
    pos_i = len(gk._CONST_NAMES) + n_w
    ext_ref = None
    if plan.ext_hash:
        ext_ref = rest[pos_i]
        pos_i += 1
    out_refs = rest[pos_i:]
    gtable_ref = out_refs[0]
    gw_refs = out_refs[1 : 1 + n_w]
    gx_ref = out_refs[1 + n_w]

    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)
        for gw in gw_refs:
            gw[:] = jnp.zeros_like(gw)

    x = x_ref[:]
    gy = gy_ref[:].astype(jnp.float32)  # [Nt, out_pad]
    nt = x.shape[0]
    F, C, L, D = plan.f, plan.n_corners, plan.n_levels, plan.d

    # positions + per-dim interpolation terms and x-derivatives (the
    # _bwd_ig_kernel formulation, grid.h:171-211)
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
    else:
        w = fract
        deriv = jnp.broadcast_to(cr["scales"], fract.shape)

    per_corner = gk._corner_indices_and_weights(
        plan, cells, w, cr, want_terms=True,
        ext=ext_ref[:] if plan.ext_hash else None,
    )
    idx = jnp.concatenate([i for i, _, _ in per_corner], axis=0)
    hi = idx >> 7
    lo = idx & (LANE - 1)
    cw = jnp.concatenate([c for _, c, _ in per_corner], axis=0)  # [C*Nt, L]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (C * nt, LANE), 1)

    # ---- gather: unweighted picks (shared with dy_dx) + weighted enc ----
    ohs, ohlos, picked_cols = [], [], [[] for _ in range(F)]
    enc_cols = []
    for l, level in enumerate(plan.levels):
        oh = (
            hi[:, l : l + 1]
            == jax.lax.broadcasted_iota(jnp.int32, (C * nt, level.h), 1)
        ).astype(jnp.bfloat16)
        ohlo = (lo[:, l : l + 1] == lane_iota).astype(jnp.float32)
        ohs.append(oh)
        ohlos.append(ohlo)
        tbl = table_ref[level.row_off : level.row_off + level.h, :]
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        for f in range(F):
            pf = jnp.sum(
                g[:, f * LANE : (f + 1) * LANE] * ohlo, axis=1,
                keepdims=True,
            )
            picked_cols[f].append(pf)
            enc_cols.append(pf * cw[:, l : l + 1])

    picked_w = jnp.concatenate(enc_cols, axis=1)  # [C*Nt, L*F] l-major
    enc = picked_w.reshape(C, nt, L * F).sum(axis=0)
    if enc_pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((nt, enc_pad), enc.dtype)], axis=1
        )

    # ---- fused MLP forward (recompute) + backward with external gy ------
    h = enc.astype(jnp.bfloat16)
    hs = [h]
    for i in range(n_w):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        h = activation_fn(z, act).astype(jnp.bfloat16)
        hs.append(h)

    g = gy
    for i in reversed(range(n_w)):
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        g = activation_bwd_out(g, hs[i + 1].astype(jnp.float32), act)
        gw_refs[i][:] = gw_refs[i][:] + jax.lax.dot_general(
            hs[i].astype(jnp.float32),
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = jax.lax.dot_general(
            g,
            w_refs[i][:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    genc = g[:, : L * F]  # [Nt, L*F] l-major f-minor
    gy_c = jnp.concatenate([genc] * C, axis=0)  # [C*Nt, L*F]

    # ---- grid scatter (reusing oh / ohlo) -------------------------------
    # one-ahead rhs expansion, like the train kernel's scatter: the VPU
    # build for level l+1 is emitted before level l's MXU scatter
    def _ig_rhs(l):
        rhs_cols = []
        for f in range(F):
            gcol = gy_c[:, l * F + f : l * F + f + 1]
            rhs_cols.append(ohlos[l] * (gcol * cw[:, l : l + 1]))
        return jnp.concatenate(rhs_cols, axis=1).astype(jnp.bfloat16)

    pend = {0: _ig_rhs(0)}
    for l, level in enumerate(plan.levels):
        if l + 1 < L:
            pend[l + 1] = _ig_rhs(l + 1)
        contrib = jax.lax.dot_general(
            ohs[l], pend.pop(l),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(level.row_off, level.row_off + level.h)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib

    # ---- dy_dx contraction (grid.h:171-211 finite-corner-difference) ----
    dot_cols = []
    for l in range(L):
        dl = None
        for f in range(F):
            t = picked_cols[f][l] * gy_c[:, l * F + f : l * F + f + 1]
            dl = t if dl is None else dl + t
        dot_cols.append(dl)
    dot_all = jnp.concatenate(dot_cols, axis=1)  # [C*Nt, L]

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
        gx_cols.append(jnp.sum(contrib, axis=1, keepdims=True))
    gx = jnp.concatenate(gx_cols, axis=1)  # [C*Nt, D]
    gx_ref[:] = gx.reshape(C, nt, D).sum(axis=0).astype(gx_ref.dtype)


def fused_ig_grads(model, params, x, gy):
    """(grads_flat, gx) via the fused input-gradient backward kernel.
    gy: [B, out_pad] output cotangent (raw - the caller owns any loss
    scale)."""
    plan = model.encoding._kernel_plan()
    mlp = model.network
    enc = model.encoding
    n_net = mlp.n_params
    enc_pad = enc.padded_output_width - plan.out_width
    net_p, enc_p = params[:n_net], params[n_net:]
    table_packed = gk.repack_table(plan, enc_p)
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(
            net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16)
        )
        off += r * c
    n_w = len(wts)

    b = x.shape[0]
    nt = max(plan.batch_tile // 4, 128)
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
        gy = jnp.pad(gy, ((0, padded - b), (0, 0)))

    consts = gk._plan_constants(plan)
    out_w = mlp.padded_output_width
    ext_specs, ext_args = gk._ext_specs_args(plan, x, nt=nt)

    in_specs = (
        [
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, out_w), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + gk._const_specs(consts)
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ]
        + ext_specs
    )
    out_specs = (
        [
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ]
        + [
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
        ]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((plan.h_total, LANE * plan.f), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [jax.ShapeDtypeStruct((padded, x.shape[1]), jnp.float32)]
    )
    outs = pl.pallas_call(
        functools.partial(
            _ig_kernel, plan=plan, mlp=mlp, n_weights=n_w, enc_pad=enc_pad
        ),
        grid=(padded // nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=gk._VMEM_LIMIT,
    )(
        x, gy.astype(jnp.float32), table_packed,
        *gk._const_args(consts), *wts, *ext_args,
    )
    gtable = outs[0]
    gwts = outs[1 : 1 + n_w]
    gx = outs[1 + n_w][:b]
    genc = gk.unpack_table_grads(plan, gtable, int(enc_p.shape[0]))
    gnet = jnp.concatenate([g.T.reshape(-1) for g in gwts])
    return jnp.concatenate([gnet, genc]).astype(jnp.float32), gx


def _composed_apply_ig(model, params, x):
    """The composed (differentiable-to-second-order) reference path the
    fused kernels must match: grid ig Pallas kernels + XLA MLP."""
    return model.apply(
        params, x, prepare_input_gradients=True, _no_fused_ig=True
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ig_backward(model, params, x, gy):
    return fused_ig_grads(model, params, x, gy)


def _fib_fwd(model, params, x, gy):
    return _fused_ig_backward(model, params, x, gy), (params, x, gy)


def _fib_bwd(model, res, cts):
    """Second order falls back to the composed machinery (whose encoding
    backward has the bwd-bwd trio): differentiate the composed backward."""
    params, x, gy = res

    from ...common import COMPUTE_DTYPE

    def composed_bwd(p, xx, g):
        _, vjp = jax.vjp(
            lambda pp, xxx: _composed_apply_ig(model, pp, xxx), p, xx
        )
        gp, gx = vjp(g.astype(COMPUTE_DTYPE))
        return gp.astype(jnp.float32), gx.astype(jnp.float32)

    _, vjp2 = jax.vjp(composed_bwd, params, x, gy)
    ct_params, ct_x, ct_gy = vjp2(
        (cts[0].astype(jnp.float32), cts[1].astype(jnp.float32))
    )
    return (
        ct_params.astype(params.dtype),
        ct_x.astype(x.dtype),
        ct_gy.astype(gy.dtype),
    )


_fused_ig_backward.defvjp(_fib_fwd, _fib_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_apply_ig(model, params, x):
    """Fused-forward model apply whose backward is the ig megakernel:
    [B, D] -> [B, out_pad] bf16; gradients to params AND x (second order
    via the composed fallback). The fast path for
    prepare_input_gradients=True workloads (SDF, modules.bwd)."""
    return fused_forward(model, params, x)


def _fai_fwd(model, params, x):
    return fused_apply_ig(model, params, x), (params, x)


def _fai_bwd(model, res, gy):
    params, x = res
    gp, gx = _fused_ig_backward(model, params, x, gy.astype(jnp.float32))
    return gp.astype(params.dtype), gx.astype(x.dtype)


fused_apply_ig.defvjp(_fai_fwd, _fai_bwd)
