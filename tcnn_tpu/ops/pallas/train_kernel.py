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
#:   "vt"    the TRANSPOSED kernel (round 4): samples on the lane dim
#:           throughout, G levels per pick matmul (full-M MXU), sublane
#:           concats/broadcasts instead of lane relayouts. Measured
#:           31.8 -> 24.2 ms on the config_hash b=2^18 fused step (v5e).
#:           Downgrades to v3b for stochastic/Rng configs.
#: All variants are mathematically identical (same products, same sums).
#: Default "vt": the measured-best form on v5e (37% over base at
#: config_hash; every config it doesn't cover downgrades automatically -
#: _resolve_variant). Trainers on a TPU backend also auto-adopt the
#: persisted autotune winners for their exact (device kind, model plan)
#: when a bench run has recorded them (Trainer.load_schedule).
PICK_VARIANT = "vt"
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

#: PROFILING ONLY (scripts/ablate_kernel_phases.py): truncate the fused
#: train kernel after a phase, writing a value-dependent scalar so Mosaic
#: cannot DCE the work. Stages (each includes the previous):
#:   "index"  shared index math (cells/hi/lo/cw)
#:   "masks"  + mask_all + every level's (oh, ohlo) build
#:   "gather" + the per-level gather matmuls
#:   "pick"   + lane pick -> enc
#:   "mlpfwd" + MLP forward
#:   "lossg"  + loss value/cotangent
#:   "mlpbwd" + MLP backward (wgrads written) -> genc; NO grid scatter
#:   ""       full kernel (production)
#: Output values are garbage for any non-"" setting.
ABLATE = ""

#: vt one-hot build form: "bcast" (sublane-broadcast hi row + sublane
#: iota + compare) or "mm" (Eh block-indicator matmul + compare against a
#: per-row constant - moves the expansion onto the MXU). MEASURED on v5e:
#: mm LOSES 24.2 -> 32.6 ms (the bcast build pipelines under the gather
#: matmuls; the extra matmul does not). Default stays "bcast".
VT_OH = "bcast"

#: batch-tile divisor for the input-gradient megakernel (fused_ig_grads;
#: nt = max(batch_tile // IG_TILE_DIV, 128)). The ig kernel caches every
#: level's one-hot masks across gather/scatter/dy_dx, so its VMEM
#: envelope - and best tile - differs from the train kernel's. MEASURED
#: on v5e (config_hash b=2^18, grad-of-fused-forward incl. the vt
#: forward): div=2 58.5 ms, div=4 65.2, div=8 60.3, div=1 fails to
#: compile (VMEM) - same division-of-labor as the train kernel's tile
#: 512 winner. Gradients bit-identical across divisors.
IG_TILE_DIV = 2

#: vt pick form: "sum" (per-(f,l) SUBLANE reduction of the masked gather
#: block - in the transposed layout the pick reduce runs over sublanes,
#: which the VPU does at full throughput, unlike the row-major layout's
#: lane reduces) or "mm" (S-selection matmul). MEASURED on v5e
#: (config_hash b=2^18, div=2): sum 22.87 ms vs mm 24.20 -> default sum.
VT_PICK = "sum"

#: vt lane-mask build: "mm" (one [128L, C*nt] expansion matmul + compare,
#: ALL levels' masks live across the whole kernel) or "bcast" (per-level
#: sublane-broadcast + iota compare, built lazily in the gather loop and
#: REBUILT in the scatter loop). bcast trades one extra compare pass per
#: level for dropping the kernel's largest VMEM resident (8 B/elem *
#: C*nt * 128L = 33 MB at nt=512). MEASURED on v5e (config_hash b=2^18,
#: scripts/probe_vt_lomask.py): train 22.8 -> 19.97 ms at div=2 and
#: inference 13.3 -> 10.26 ms at tile 512 (-12.5% / -23%: the per-level
#: builds pipeline under the gather matmuls AND the footprint drop
#: relieves VMEM pressure at the same tile; bigger tiles still lose -
#: div=1 22.1 ms, infer tile 1024 18.4 ms). A third form "cache" keeps
#: the per-level bcast masks live for the scatter loop (no rebuild,
#: half mm's resident): measured 19.81 vs bcast 19.88 ms - the rebuild
#: is free under the scatter matmuls, so the lower-residency bcast stays
#: default. Masks are exact integer compares in every form: gradients
#: bit-identical.
VT_LOMASK = "bcast"

#: vt cross-tile software pipeline: instance g computes tile g+1's index
#: math (hi/lo/cw) and parks it in VMEM scratch, while the gather/scatter
#: matmuls for tile g consume the values instance g-1 parked. Bit-
#: identical (i32/f32 scratch roundtrip is exact). MEASURED NO-OP on v5e
#: (19.85 -> 19.84 ms at config_hash b=2^18, scripts/probe_vt_pipeline
#: .py) - and the "nowrite" profiling mode (drop the index-math chain
#: entirely, garbage outputs) buys only 0.15 ms, i.e. Mosaic ALREADY
#: hides the index math under the matmuls in the unpipelined kernel;
#: the additive phase-ablation deltas misattribute it. A separate probe
#: (scripts/probe_vpu_mxu_overlap.py) confirms Mosaic overlaps ~80% of
#: an independent VPU chain under MXU work. Default off; kept as the
#: receipt for "the index math is not the bottleneck".
VT_PIPELINE = False

#: vt f-on-lanes table packing (dense_ext_kernel.py's layout): lane =
#: (row % LQ) * F + f with LQ = 128 // F, so the gather's candidate
#: block is gT [128, C*nt] instead of [128F, C*nt] - HALF the f32
#: write+read traffic at F=2 (the pick's intrinsic-gT-traffic cost that
#: round 5 root-caused as the one real expense above the matmul floor),
#: and ONE mask pass + an aligned-slab tree reduce picks all F features
#: (the standard layout pays F where passes). The price: hi = row // LQ
#: makes the one-hot F times taller (2x build compares + bf16 traffic
#: at F=2). MEASURED on v5e (config_hash b=2^18, scan-chained:
#: scripts/probe_vt_flanes.py + /tmp-style end-to-end run): standalone
#: encoding loop 20.17 -> 18.85 ms, fused train step 19.64 -> 18.20 ms
#: (13.35 -> 14.41 M samples/s), forward-only 10.10 -> 9.10 ms
#: (25.9 -> 28.8 M samples/s). Values are BIT-identical to the standard
#: packing (one-hot matmuls select the same entries; the tree reduce
#: reassociates exact zeros only) - pinned by
#: test_vt_fl_matches_standard_layout. Applies when
#: F in {2, 4, 8} and the other vt knobs are at forms that have an fl
#: build (bcast oh, sum pick, bcast/cache lomask); F=1's LQ=128 IS the
#: standard layout, and the mm forms keep their own machinery.
VT_FL = True


def _use_fl(plan) -> bool:
    """Whether the vt kernels run the f-on-lanes layout at the current
    knobs (see VT_FL). Callers must already have resolved variant == vt."""
    return (
        VT_FL
        and plan.f in (2, 4, 8)
        and VT_PICK == "sum"
        and VT_OH == "bcast"
        and VT_LOMASK in ("bcast", "cache")
    )


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


def _cached_mask_bytes(plan, c_nt, oh_h=None):
    """All levels' (oh bf16, ohlo f32) masks held live across phases.
    oh_h overrides the one-hot height total (the f-on-lanes layout's
    one-hots are F times taller - see VT_FL)."""
    h = plan.h_total if oh_h is None else oh_h
    return c_nt * h * 2 + c_nt * 128 * plan.n_levels * 4


def _transient_mask_bytes(plan, c_nt, fl=False):
    """Pipelined builds: ~2 levels of (oh, ohlo) live at once."""
    h_max = max(lvl.h for lvl in plan.levels) * (plan.f if fl else 1)
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
    fl = variant == "vt" and _use_fl(plan)
    mask_bytes = (
        _transient_mask_bytes(plan, c_nt, fl=fl)
        if plan.stochastic or RECOMPUTE_MASKS
        else _cached_mask_bytes(
            plan, c_nt, oh_h=gk.fl_levels(plan)[1] if fl else None
        )
    )
    gtable_bytes = plan.h_total * 128 * plan.f * 4
    # v3b materializes lo_b [C*Nt, 128L] f32 AND the i1 mask_all (Mosaic
    # lays i1 out in 32-bit lanes): 8 bytes/elem while both are live.
    # vt under VT_LOMASK="bcast" builds lane masks per level (transient,
    # ~2 live); "cache" keeps all levels' bool masks but no f32 expansion
    # (4 B/elem, i1 in 32-bit lanes).
    n_mask_levels, mask_elem_bytes = plan.n_levels, 8
    if variant == "vt" and VT_LOMASK == "bcast":
        n_mask_levels = 2
    elif variant == "vt" and VT_LOMASK == "cache":
        mask_elem_bytes = 4
    mask_all_bytes = (
        mask_elem_bytes * c_nt * 128 * n_mask_levels
        if variant in ("v3b", "vt")
        else 0
    )
    est = mask_bytes + _table_bytes(plan) + gtable_bytes + mask_all_bytes
    if variant == "vt" and VT_PIPELINE:
        est += 3 * plan.n_levels * c_nt * 4  # hi/lo/cw pipeline scratch
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
    # picked accumulator. vt: charging the same 8 B/elem rejected tiles
    # that MEASURABLY run (plan tile 1024 = 13.2 ms, tile 2048 runs too -
    # scripts/probe_vt_infer.py): Mosaic frees lo_bT before the per-level
    # consumers, so only the f32 expansion is charged. VT_LOMASK="bcast"
    # and "cache" have no all-levels resident (the forward consumes each
    # level's mask once; ~2 levels live).
    n_mask_levels = plan.n_levels
    if variant == "vt" and VT_LOMASK in ("bcast", "cache"):
        n_mask_levels = 2
    mask_all_bytes = (
        (8 if variant == "v3b" else 4) * c_nt * 128 * n_mask_levels
        if variant in ("v3b", "vt")
        else 0
    )
    picked_bytes = c_nt * plan.f * plan.n_levels * 4
    fl = variant == "vt" and _use_fl(plan)
    est = (_transient_mask_bytes(plan, c_nt, fl=fl) + idx_bytes
           + _table_bytes(plan) + mask_all_bytes + picked_bytes)
    return est < 70 * 1024 * 1024


def _resolve_variant(plan, infer: bool = False) -> str:
    """The pick variant actually used for this plan: Nearest has no
    interpolation weights, so the weight-at-the-end variants reduce to
    base (and the wrapper must agree with the kernel on the enc layout).
    The forward-only kernel (infer=True) uses INFER_VARIANT when set.
    "vt" (the transposed kernel) covers the standard interpolated dense
    path; stochastic and precomputed-hash configs downgrade to v3b (their
    row-major machinery), keeping every config on a fused kernel."""
    from ...common import InterpolationType

    if plan.interpolation == InterpolationType.Nearest:
        return "base"
    v = (INFER_VARIANT or PICK_VARIANT) if infer else PICK_VARIANT
    if v == "vt" and (plan.stochastic or plan.ext_hash):
        return "v3b"
    if v not in ("base", "cwend", "v3b", "vt"):
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


# ---------------------------------------------------------------------------
# "vt" - the transposed kernel. Samples live on the LANE dimension
# ([rows, C*Nt] everywhere), which fixes the two dominant costs of the
# row-major variants (measured, scripts/ablate_kernel_phases.py v3b@256:
# pick +9.8 ms, scatter +10.2 ms of a 31.7 ms step):
#   - the pick matmul becomes dot(S_l^T-contraction, gm^T) -> [F*L, C*Nt]:
#     full 128-lane output instead of an F*L(=32)-wide result padded to
#     128 lanes (4x MXU waste), and the per-level F-loop of lane selects
#     collapses to one sublane-tiled select;
#   - the scatter rhs build replaces per-level thin-column LANE broadcasts
#     + lane concats (relayouts) with sublane broadcasts + free sublane
#     concats; the scatter matmul contracts the lane dim of both operands.
# The MLP runs transposed ([width, Nt]) so no transposes appear anywhere
# inside the kernel; x/targets/noise/pdf arrive pre-transposed from the
# wrapper (one cheap XLA transpose per batch, outside the kernel).
# ---------------------------------------------------------------------------


def _plan_constants_vt(plan):
    """gk._plan_constants transposed: [1, N] rows -> [N, 1] columns,
    corner_bits [C, D*L] -> [D*L, C]."""
    consts = gk._plan_constants(plan)
    return {name: consts[name].T for name in gk._CONST_NAMES}


def _pick_group(plan, n_active):
    """Levels per pick matmul. In theory the selection matmul's M = F*L
    < 128 wastes MXU output rows and packing G = 128 // (F*L) levels per
    matmul should win; MEASURED on v5e (config_hash b=2^18) G=4 LOSES
    badly (24.2 -> 33.2 ms/step): the [G*128F, cnt] gm concat is a real
    sublane copy and buffering G gm blocks breaks the build-under-matmul
    pipelining. G=1 stays until a zero-copy chunk layout exists."""
    return 1


def _pick_consts_vt(plan, active):
    """vt constant operands: E bf16 [L, 128L] (reused as the mask-expansion
    LHS via a dim-0 contraction), iota_col f32 [128L, 1] (j % 128 per row),
    S2 bf16 [len(active)*128F, G*F*L]: the selection matrix packed G
    active levels per chunk - row block i (i = position in `active`)
    carries level active[i]'s S_l placed at column block (i % G), so one
    [G*128F, cnt] matmul picks G levels into disjoint row groups of a
    [G*F*L(=128), cnt] accumulator (summed into [F*L, cnt] afterwards)."""
    import numpy as np

    e, iota, _ = _pick_consts(plan)
    L, F = plan.n_levels, plan.f
    G = _pick_group(plan, len(active))
    s2 = np.zeros((len(active) * LANE * F, G * F * L), np.float32)
    for i, l in enumerate(active):
        k = i % G
        for f in range(F):
            rows = slice(i * LANE * F + f * LANE, i * LANE * F + (f + 1) * LANE)
            s2[rows, k * F * L + f * L + l] = 1.0
    # oh-build operands (VT_OH == "mm"): Eh [h_total, L] level-block
    # indicator, iota_rows [h_total, 1] = row index within the level
    eh = np.zeros((plan.h_total, L), np.float32)
    iota_rows = np.zeros((plan.h_total, 1), np.float32)
    for l, level in enumerate(plan.levels):
        eh[level.row_off : level.row_off + level.h, l] = 1.0
        iota_rows[level.row_off : level.row_off + level.h, 0] = np.arange(
            level.h
        )
    return (
        e,
        iota.T,
        jnp.asarray(s2, jnp.bfloat16),
        jnp.asarray(eh, jnp.bfloat16),
        jnp.asarray(iota_rows, jnp.float32),
    )


def _index_math_vt(plan, xT, cr, want_ig=False, lq=LANE):
    """xT [D, nt] -> (hiT, loT, cwT) i32/i32/f32 [L, C*nt]: the transposed
    mirror of gk._stacked_hi_lo_w_v2 (same wide-op structure; corners are
    LANE-stacked blocks, constants are [N, 1] columns broadcast over
    lanes). Only the standard interpolated path (no Nearest, no ext hash -
    _resolve_variant downgrades those). lq: rows per packed-table lane
    group (128 standard, 128/F under the f-on-lanes layout - see VT_FL).

    want_ig additionally returns (termT, bitsT, derivT) for the dy_dx
    contraction: termT [D*L, C*nt] per-dim selected factors (w or 1-w),
    bitsT [D*L, C*nt] corner bits, derivT [D*L, nt] dW/dx chain factors
    (scales, or the smoothstep derivative * scales)."""
    from ...common import InterpolationType, smoothstep

    L, D, C = plan.n_levels, plan.d, plan.n_corners
    nt = xT.shape[1]

    # [D*L, nt]: row d*L+l carries dim d of level l (sublane replication)
    xx = jnp.concatenate(
        [jnp.broadcast_to(xT[d : d + 1, :], (L, nt)) for d in range(D)],
        axis=0,
    )
    pos = xx * cr["scales"] + 0.5
    cell_f = jnp.floor(pos)
    fract = pos - cell_f
    cells = cell_f.astype(jnp.int32)
    w = (
        smoothstep(fract)
        if plan.interpolation == InterpolationType.Smoothstep
        else fract
    )

    cells_s = jnp.concatenate([cells] * C, axis=1)  # [D*L, C*nt]
    w_s = jnp.concatenate([w] * C, axis=1)
    cb = cr["corner_bits"]  # [D*L, C]
    bits = jnp.concatenate(
        [jnp.broadcast_to(cb[:, c : c + 1], (D * L, nt)) for c in range(C)],
        axis=1,
    )

    cc = cells_s + bits
    dmul = cc * cr["strides"]
    hmul = cc * cr["factors"]
    csum = dmul[:L, :]
    hxor = hmul[:L, :]
    for d in range(1, D):
        csum = csum + dmul[d * L : (d + 1) * L, :]
        hxor = hxor ^ hmul[d * L : (d + 1) * L, :]
    term = (1.0 - w_s) + bits.astype(jnp.float32) * (2.0 * w_s - 1.0)
    cw = term[:L, :]
    for d in range(1, D):
        cw = cw * term[d * L : (d + 1) * L, :]

    raw = jnp.where(cr["hash_mask"] == 1, hxor, csum)  # [L, C*nt]
    idx_and = raw & cr["size_m1"]
    fraw = raw.astype(jnp.float32)
    idx_fmod = (
        fraw - jnp.floor(fraw / cr["size_f"]) * cr["size_f"]
    ).astype(jnp.int32)
    idx = jnp.where(cr["pow2_mask"] == 1, idx_and, idx_fmod)
    if want_ig:
        deriv = (
            6.0 * fract * (1.0 - fract) * cr["scales"]
            if plan.interpolation == InterpolationType.Smoothstep
            else jnp.broadcast_to(cr["scales"], fract.shape)
        )  # [D*L, nt]
        sh = lq.bit_length() - 1
        return (idx >> sh, idx & (lq - 1), cw,
                term, bits.astype(jnp.float32), deriv)
    sh = lq.bit_length() - 1
    return idx >> sh, idx & (lq - 1), cw


def _kernel_vt(
    xT_ref,
    *args,
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
    pipeline=False,
    ablate="",
    fl=False,
):
    n_w = n_weights
    if pipeline:
        xn_ref, rest = args[0], args[1:]
    else:
        xn_ref, rest = None, args
    (tT_ref, table_ref, e_ref, iota_col_ref, s_ref, eh_ref,
     iota_rows_ref) = rest[:7]
    rest = rest[7:]
    const_refs = rest[: len(gk._CONST_NAMES)]
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
    out_refs = rest[pos:]
    gtable_ref = out_refs[0]
    gw_refs = out_refs[1 : 1 + n_w]
    loss_ref = out_refs[1 + n_w]
    im_scratch = out_refs[2 + n_w :] if pipeline else ()

    def _truncate(dep):
        # FULL reduction: a slice dep lets Mosaic shrink the stage's
        # matmuls (see the row-major twin's docstring)
        loss_ref[0, 0] = loss_ref[0, 0] + jnp.sum(dep) * 1e-30

    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)
        for gw in gw_refs:
            gw[:] = jnp.zeros_like(gw)
        loss_ref[0, 0] = jnp.float32(0.0)

    xT = xT_ref[:]
    nt = xT.shape[1]
    F, C, L = plan.f, plan.n_corners, plan.n_levels
    cnt = C * nt
    # f-on-lanes geometry (VT_FL): per-level (row_off, h) into the
    # [fl_h_total, 128] packed table, lo in [0, 128/F)
    lq = (LANE // F) if fl else LANE
    fl_geom = gk.fl_levels(plan)[0] if fl else None

    def _geom(l):
        if fl:
            return fl_geom[l]
        level = plan.levels[l]
        return level.row_off, level.h

    if pipeline:
        hi_s, lo_s, cw_s = im_scratch

        @pl.when(pl.program_id(0) == 0)
        def _seed():
            h0, l0, c0 = _index_math_vt(plan, xT, cr, lq=lq)
            hi_s[:] = h0
            lo_s[:] = l0
            cw_s[:] = c0

        # tile g's values (parked by instance g-1, or the seed above)
        hiT, loT, cwT = hi_s[:], lo_s[:], cw_s[:]
        if pipeline != "nowrite":  # "nowrite": PROFILING ONLY - every
            # tile reuses tile 0's indices (garbage outputs) to price the
            # index-math chain inside the real kernel
            # park tile g+1's: this chain is independent of everything
            # below, so Mosaic schedules it under the gather/scatter
            # matmuls (same-ref program order keeps the writes after the
            # reads above)
            hn, ln, wn = _index_math_vt(plan, xn_ref[:], cr, lq=lq)
            hi_s[:] = hn
            lo_s[:] = ln
            cw_s[:] = wn
    else:
        hiT, loT, cwT = _index_math_vt(plan, xT, cr, lq=lq)
    if ablate == "index":
        _truncate(hiT.astype(jnp.float32) + loT.astype(jnp.float32) + cwT)
        return

    if VT_LOMASK == "mm":
        # lane masks for ALL levels: [128L, C*nt] bool (rows l*128 + j)
        lo_bT = jax.lax.dot_general(
            e_ref[:], loT.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mask_allT = lo_bT == iota_col_ref[:]

    # "cache": per-level bcast builds kept live for the scatter loop
    # (half mm's resident - no f32 lo_bT - and no scatter-loop rebuild)
    _mask_cache = [None] * L

    def _lane_mask(l):
        """Level l's [128, C*nt] lane mask: mask(j, s) = lo(l, s) == j
        (fl: == j // F, selecting the F-row slab of lane candidates)."""
        if VT_LOMASK == "mm":
            return mask_allT[l * LANE : (l + 1) * LANE, :]
        if _mask_cache[l] is not None:
            return _mask_cache[l]
        iot = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)
        if fl:
            iot = iot // F
        m = jnp.broadcast_to(loT[l : l + 1, :], (LANE, cnt)) == iot
        if VT_LOMASK == "cache":
            _mask_cache[l] = m
        return m

    def _build(l, level):
        """One level's transposed one-hot [h, C*nt] bf16 (the VT_OH forms
        produce identical values: hi < h <= 2^15 is bf16/f32-exact)."""
        if VT_OH == "mm":
            sl = slice(level.row_off, level.row_off + level.h)
            hi_exp = jax.lax.dot_general(
                eh_ref[sl, :], hiT.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (hi_exp == iota_rows_ref[sl, :]).astype(jnp.bfloat16)
        h = _geom(l)[1]
        hr = jnp.broadcast_to(hiT[l : l + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    active = [
        l for l, _ in enumerate(plan.levels)
        if _level_active(plan, l, max_level)
    ]
    if ablate == "masks":
        dep = jnp.zeros((), jnp.float32)
        for l in active:
            dep = dep + jnp.sum(_build(l, plan.levels[l]).astype(jnp.float32))
            dep = dep + jnp.sum(_lane_mask(l).astype(jnp.float32))
        _truncate(dep)
        return

    # ---- gather + pick ------------------------------------------------------
    # G active levels share one selection matmul (M = G*F*L -> 128: full
    # MXU output rows; a single level's M = F*L wastes 1 - F*L/128 of the
    # array) - see _pick_consts_vt
    G = _pick_group(plan, len(active))
    ohTs = [None] * L
    picked_big = jnp.zeros((G * F * L, cnt), jnp.float32)
    built = {}
    if active:
        built[active[0]] = _build(active[0], plan.levels[active[0]])
    abl_dep = None
    chunk_gm = []
    pick_rows = {}
    for i, l in enumerate(active):
        if i + 1 < len(active):
            nl = active[i + 1]
            built[nl] = _build(nl, plan.levels[nl])
        ohT = built.pop(l)
        off_l, h_l = _geom(l)
        keep = not recompute
        ohTs[l] = ohT if keep else None
        tbl = table_ref[off_l : off_l + h_l, :]
        # gT [128F, C*nt] f32 (fl: [128, C*nt] - half the traffic at F=2):
        # features on sublanes, samples on lanes. (bf16 gT + mask-multiply
        # pick was MEASURED WORSE on v5e - train 19.85 -> 20.22 ms,
        # inference 10.3 -> 27 ms: the i1->bf16 mask cast and the
        # narrowing pass cost more than the halved VMEM traffic buys.
        # Keep the f32 gT + i1 where.)
        gT = jax.lax.dot_general(
            tbl, ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ablate == "gather":
            abl_dep = jnp.sum(gT) + (abl_dep if abl_dep is not None else 0.0)
            continue
        maskl = _lane_mask(l)
        if fl:
            # ONE mask pass selects the F-row slab; an 8-aligned tree
            # reduce folds the LQ slabs to [F, cnt] (rows ordered by
            # j % F = f, so slicing recovers the f-major pick_rows)
            gm = jnp.where(maskl, gT, 0.0)
            red = gm[:8, :]
            for k in range(1, LANE // 8):
                red = red + gm[k * 8 : (k + 1) * 8, :]
            w = 8
            while w > F:
                w //= 2
                red = red[:w, :] + red[w:, :]
            for f in range(F):
                pick_rows[f * L + l] = red[f : f + 1, :]
            continue
        if VT_PICK == "sum":
            # sublane reduction pick: full-throughput on the VPU in this
            # layout (the row-major twin's lane reduce was the +7.6 ms
            # cost v3b existed to avoid)
            for f in range(F):
                gm_f = jnp.where(maskl, gT[f * LANE : (f + 1) * LANE, :], 0.0)
                pick_rows[f * L + l] = jnp.sum(gm_f, axis=0, keepdims=True)
            continue
        mask2 = jnp.concatenate([maskl] * F, axis=0)  # free sublane concat
        chunk_gm.append(jnp.where(mask2, gT, 0.0).astype(jnp.bfloat16))
        if len(chunk_gm) == G or i == len(active) - 1:
            i0 = i + 1 - len(chunk_gm)
            gm_chunk = (
                jnp.concatenate(chunk_gm, axis=0)
                if len(chunk_gm) > 1
                else chunk_gm[0]
            )
            picked_big = picked_big + jax.lax.dot_general(
                s_ref[i0 * LANE * F : (i + 1) * LANE * F, :], gm_chunk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            chunk_gm = []
    if ablate == "gather":
        _truncate(abl_dep)
        return
    if VT_PICK == "sum":
        zrow = jnp.zeros((1, cnt), jnp.float32)
        picked_t = jnp.concatenate(
            [pick_rows.get(r, zrow) for r in range(F * L)], axis=0
        )
    else:
        picked_t = picked_big[: F * L, :]
        for k in range(1, G):
            picked_t = picked_t + picked_big[k * F * L : (k + 1) * F * L, :]

    cw_exp = jnp.concatenate([cwT] * F, axis=0)  # [F*L, C*nt], rows f*L+l
    picked_t = picked_t * cw_exp
    # corner reduction on vreg-aligned lane slices
    encT = picked_t[:, :nt]
    for c in range(1, C):
        encT = encT + picked_t[:, c * nt : (c + 1) * nt]
    if enc_pad:
        encT = jnp.concatenate(
            [encT, jnp.zeros((enc_pad, nt), encT.dtype)], axis=0
        )
    if ablate == "pick":
        _truncate(encT)
        return

    # ---- fused MLP forward (transposed: [width, Nt]) ------------------------
    hT = encT.astype(jnp.bfloat16)
    hsT = [hT]
    for i in range(n_w):
        zT = jax.lax.dot_general(
            w_refs[i][:], hT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        hT = activation_fn(zT, act).astype(jnp.bfloat16)
        hsT.append(hT)
    if ablate == "mlpfwd":
        _truncate(hsT[-1].astype(jnp.float32))
        return

    if has_ext_dl:
        gT = tT_ref[:].astype(jnp.float32)
        loss_ref[0, 0] = jnp.float32(0.0)
    else:
        predT = hsT[-1].astype(jnp.float32)  # [out_pad, Nt]
        if noise_ref is not None:
            predT = predT + noise_ref[:].astype(jnp.float32)
        targetsT = tT_ref[:].astype(jnp.float32)
        pdfT = (
            pdf_ref[:].astype(jnp.float32)
            if pdf_ref is not None
            else jnp.ones_like(targetsT)
        )
        values, grad = loss.value_and_grad_fn(
            predT, targetsT, pdfT, dims_axis=0
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)
        valid = (col + pl.program_id(0) * nt < n_valid).astype(jnp.float32)
        values = values * valid
        grad = grad * valid
        loss_ref[0, 0] = loss_ref[0, 0] + jnp.sum(values)
        gT = grad * loss_scale  # [out_pad, Nt] f32
    if ablate == "lossg":
        _truncate(gT)
        return

    # ---- fused MLP backward (transposed) ------------------------------------
    for i in reversed(range(n_w)):
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        gT = activation_bwd_out(gT, hsT[i + 1].astype(jnp.float32), act)
        gw_refs[i][:] = gw_refs[i][:] + jax.lax.dot_general(
            hsT[i].astype(jnp.float32), gT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gT = jax.lax.dot_general(
            w_refs[i][:].astype(jnp.float32), gT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    gencT = gT[: L * F, :]  # [F*L, Nt]
    if ablate == "mlpbwd":
        _truncate(gencT)
        return

    # cotangent tiled over corners with the weights folded in (reuses
    # cw_exp): [F*L, C*nt]
    gy_all = jnp.concatenate([gencT] * C, axis=1) * cw_exp

    # ---- grid scatter --------------------------------------------------------
    def _scatter_operands(l):
        ohT_l = ohTs[l] if ohTs[l] is not None else _build(l, plan.levels[l])
        # rhsT [128F, C*nt]: row f*128+j holds gy(f, l) broadcast over the
        # 128 lane-rows (sublane broadcast), masked to the pick lane
        # (under VT_LOMASK="bcast" this REBUILDS the mask - one compare
        # pass per level, in exchange for not keeping [128L, C*nt] live)
        maskl = _lane_mask(l)
        if fl:
            # [128, C*nt]: the level's F cotangent rows tiled LQ times
            # over sublanes (row j carries feature j % F), masked to the
            # pick slab - one where pass (the standard layout pays F)
            ct_l = jnp.concatenate(
                [gy_all[f * L + l : f * L + l + 1, :] for f in range(F)],
                axis=0,
            )
            tiled = jnp.concatenate([ct_l] * (LANE // F), axis=0)
            return ohT_l, jnp.where(maskl, tiled, 0.0).astype(jnp.bfloat16)
        rhs_rows = []
        for f in range(F):
            grow = gy_all[f * L + l : f * L + l + 1, :]
            rhs_rows.append(
                jnp.where(maskl, jnp.broadcast_to(grow, (LANE, cnt)), 0.0)
            )
        return ohT_l, jnp.concatenate(rhs_rows, axis=0).astype(jnp.bfloat16)

    pend = {}
    if active:
        pend[active[0]] = _scatter_operands(active[0])
    for i, l in enumerate(active):
        if i + 1 < len(active):
            nl = active[i + 1]
            pend[nl] = _scatter_operands(nl)
        ohT_l, rhsT = pend.pop(l)
        off_l, h_l = _geom(l)
        contrib = jax.lax.dot_general(
            ohT_l, rhsT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(off_l, off_l + h_l)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib


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
    ablate="",
):
    n_w = n_weights

    def _truncate(dep):
        """ABLATE exit: fold a FULL reduction of the last phase's result
        into the loss output - a [:1,:1] slice is NOT enough (Mosaic
        slices through elementwise chains and shrinks matmul M dims,
        silently DCE-ing the stage under test; observed on v5e)."""
        loss_ref[0, 0] = loss_ref[0, 0] + jnp.sum(dep) * 1e-30
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
    if ablate == "index":
        _truncate(
            hi_cl.astype(jnp.float32) + lo_cl.astype(jnp.float32)
            + (cw_cl if cw_cl is not None else 0.0)
        )
        return

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
    if ablate == "masks":
        dep = jnp.zeros((), jnp.float32)
        for l in active:
            oh, ohlo = _build(l, plan.levels[l])
            dep = dep + jnp.sum(oh.astype(jnp.float32)) + jnp.sum(
                ohlo.astype(jnp.float32)
            )
        _truncate(dep)
        return
    if active:
        built[active[0]] = _build(active[0], plan.levels[active[0]])
    abl_dep = None
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
        if ablate == "gather":
            ohd = jnp.sum(ohlo.astype(jnp.float32))
            abl_dep = jnp.sum(g) + ohd + (
                abl_dep if abl_dep is not None else 0.0
            )
            continue
        if variant == "v3b":
            picked_acc = _v3b_pick(picked_acc, g, ohlo, s_ref, l, F)
        else:
            for f in range(F):
                cols[(l, f)] = jnp.sum(
                    g[:, f * LANE : (f + 1) * LANE] * ohlo,
                    axis=1,
                    keepdims=True,
                )
    if ablate == "gather":
        _truncate(abl_dep)
        return

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
    if ablate == "pick":
        _truncate(enc)
        return

    # ---- fused MLP forward --------------------------------------------------
    h = enc.astype(jnp.bfloat16)
    hs = [h]
    for i in range(n_w):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        h = activation_fn(z, act).astype(jnp.bfloat16)
        hs.append(h)
    if ablate == "mlpfwd":
        _truncate(hs[-1].astype(jnp.float32))
        return

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
    if ablate == "lossg":
        _truncate(g)
        return

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
    if ablate == "mlpbwd":
        _truncate(genc)
        return

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


def _infer_kernel_vt(xT_ref, table_ref, e_ref, iota_col_ref, s_ref,
                     eh_ref, iota_rows_ref, *rest,
                     plan, mlp, n_weights, enc_pad):
    """Transposed forward-only kernel (see _kernel_vt); writes yT
    [out_pad, nt] - the wrapper transposes back outside."""
    const_refs = rest[: len(gk._CONST_NAMES)]
    w_refs = rest[len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + n_weights]
    y_ref = rest[len(gk._CONST_NAMES) + n_weights]
    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    xT = xT_ref[:]
    nt = xT.shape[1]
    F, C, L = plan.f, plan.n_corners, plan.n_levels
    cnt = C * nt

    fl = _use_fl(plan)
    lq = (LANE // F) if fl else LANE
    fl_geom = gk.fl_levels(plan)[0] if fl else None

    def _geom(l):
        if fl:
            return fl_geom[l]
        level = plan.levels[l]
        return level.row_off, level.h

    hiT, loT, cwT = _index_math_vt(plan, xT, cr, lq=lq)
    if VT_LOMASK == "mm":
        lo_bT = jax.lax.dot_general(
            e_ref[:], loT.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mask_allT = lo_bT == iota_col_ref[:]

    def _lane_mask(l):
        if VT_LOMASK == "mm":
            return mask_allT[l * LANE : (l + 1) * LANE, :]
        iot = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)
        if fl:
            iot = iot // F
        return jnp.broadcast_to(loT[l : l + 1, :], (LANE, cnt)) == iot

    def _build(l, level):
        """One level's transposed one-hot [h, C*nt] bf16 (the VT_OH forms
        produce identical values: hi < h <= 2^15 is bf16/f32-exact)."""
        if VT_OH == "mm":
            sl = slice(level.row_off, level.row_off + level.h)
            hi_exp = jax.lax.dot_general(
                eh_ref[sl, :], hiT.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (hi_exp == iota_rows_ref[sl, :]).astype(jnp.bfloat16)
        h = _geom(l)[1]
        hr = jnp.broadcast_to(hiT[l : l + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    G = _pick_group(plan, L)
    picked_big = jnp.zeros((G * F * L, cnt), jnp.float32)
    chunk_gm = []
    pick_rows = {}
    nxt = _build(0, plan.levels[0])
    for l, level in enumerate(plan.levels):
        ohT = nxt
        if l + 1 < L:
            nxt = _build(l + 1, plan.levels[l + 1])
        off_l, h_l = _geom(l)
        tbl = table_ref[off_l : off_l + h_l, :]
        gT = jax.lax.dot_general(
            tbl, ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        maskl = _lane_mask(l)
        if fl:
            gm = jnp.where(maskl, gT, 0.0)
            red = gm[:8, :]
            for k in range(1, LANE // 8):
                red = red + gm[k * 8 : (k + 1) * 8, :]
            w = 8
            while w > F:
                w //= 2
                red = red[:w, :] + red[w:, :]
            for f in range(F):
                pick_rows[f * L + l] = red[f : f + 1, :]
            continue
        if VT_PICK == "sum":
            for f in range(F):
                gm_f = jnp.where(maskl, gT[f * LANE : (f + 1) * LANE, :], 0.0)
                pick_rows[f * L + l] = jnp.sum(gm_f, axis=0, keepdims=True)
            continue
        mask2 = jnp.concatenate([maskl] * F, axis=0)
        chunk_gm.append(jnp.where(mask2, gT, 0.0).astype(jnp.bfloat16))
        if len(chunk_gm) == G or l == L - 1:
            i0 = l + 1 - len(chunk_gm)
            gm_chunk = (
                jnp.concatenate(chunk_gm, axis=0)
                if len(chunk_gm) > 1
                else chunk_gm[0]
            )
            picked_big = picked_big + jax.lax.dot_general(
                s_ref[i0 * LANE * F : (l + 1) * LANE * F, :], gm_chunk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            chunk_gm = []
    if VT_PICK == "sum":
        picked_t = jnp.concatenate(
            [pick_rows[r] for r in range(F * L)], axis=0
        )
    else:
        picked_t = picked_big[: F * L, :]
        for k in range(1, G):
            picked_t = picked_t + picked_big[k * F * L : (k + 1) * F * L, :]
    picked_t = picked_t * jnp.concatenate([cwT] * F, axis=0)
    encT = picked_t[:, :nt]
    for c in range(1, C):
        encT = encT + picked_t[:, c * nt : (c + 1) * nt]
    if enc_pad:
        encT = jnp.concatenate(
            [encT, jnp.zeros((enc_pad, nt), encT.dtype)], axis=0
        )
    hT = encT.astype(jnp.bfloat16)
    for i in range(n_weights):
        zT = jax.lax.dot_general(
            w_refs[i][:], hT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        act = mlp.output_activation if i == n_weights - 1 else mlp.activation
        hT = activation_fn(zT, act).astype(jnp.bfloat16)
    y_ref[:] = hT.astype(y_ref.dtype)


def prepare_forward(model, params):
    """Device-ready fused_forward operands: (packed table, transposed
    bf16 weights). Splitting this from the call lets repeated inference
    skip the per-call table repack + weight transform (~2 ms at config
    hash scale) - the analog of the reference keeping persistent device
    weight buffers across inference calls."""
    plan = model.encoding._kernel_plan()
    mlp = model.network
    n_net = mlp.n_params
    net_p, enc_p = params[:n_net], params[n_net:]
    variant = _resolve_variant(plan, infer=True)
    fl = variant == "vt" and _use_fl(plan)
    table_packed = (
        gk.repack_table_fl(plan, enc_p) if fl else gk.repack_table(plan, enc_p)
    )
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16))
        off += r * c
    if variant != "base":
        perm, _ = _fm_row_perm(plan, int(wts[0].shape[0]))
        wts[0] = wts[0][perm, :]
    return table_packed, tuple(wts)


def fused_forward(model, params, x):
    """Inference-only fused grid+MLP forward: [B, D] -> [B, out_pad] bf16.
    Not differentiable (use the composed path or fused_train_grads for
    gradients)."""
    return fused_forward_prepared(model, prepare_forward(model, params), x)


def fused_forward_prepared(model, prepared, x):
    """fused_forward from `prepare_forward` operands (repack skipped)."""
    plan = model.encoding._kernel_plan()
    mlp = model.network
    enc = model.encoding
    enc_pad = enc.padded_output_width - plan.out_width
    table_packed, wts = prepared
    wts = list(wts)
    variant = _resolve_variant(plan, infer=True)

    b = x.shape[0]
    nt = INFER_TILE or plan.batch_tile
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
    vt = variant == "vt"
    consts = _plan_constants_vt(plan) if vt else gk._plan_constants(plan)
    out_w = mlp.padded_output_width
    if vt:
        x = x.T  # samples on lanes; ext_hash configs never resolve to vt
        ext_specs, ext_args = [], []
        pick_args = list(_pick_consts_vt(plan, list(range(plan.n_levels))))
        kern = functools.partial(
            _infer_kernel_vt, plan=plan, mlp=mlp, n_weights=len(wts),
            enc_pad=enc_pad,
        )
        x_spec = pl.BlockSpec((x.shape[0], nt), lambda g: (0, g),
                              memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec((out_w, nt), lambda g: (0, g),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((out_w, padded), jnp.bfloat16)
    else:
        ext_specs, ext_args = gk._ext_specs_args(plan, x, nt=nt,
                                                 stacked=True)
        pick_args = list(_pick_consts(plan)) if variant == "v3b" else []
        kern = functools.partial(
            _infer_kernel, plan=plan, mlp=mlp, n_weights=len(wts),
            enc_pad=enc_pad, variant=variant,
        )
        x_spec = pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                              memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec((nt, out_w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((padded, out_w), jnp.bfloat16)
    pick_specs = [
        pl.BlockSpec(a.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for a in pick_args
    ]

    y = pl.pallas_call(
        kern,
        grid=(padded // nt,),
        in_specs=[
            x_spec,
            pl.BlockSpec(
                tuple(table_packed.shape),
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
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=gk._VMEM_LIMIT,
    )(x, table_packed, *pick_args, *ext_args, *gk._const_args(consts), *wts)
    return y.T[:b] if vt else y[:b]


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
    variant = _resolve_variant(plan)
    fl = variant == "vt" and _use_fl(plan)
    table_packed = (
        gk.repack_table_fl(plan, enc_p) if fl else gk.repack_table(plan, enc_p)
    )
    tbl_shape = tuple(table_packed.shape)
    # transposed bf16 weights [fan_in, fan_out] (mlp_kernel convention)
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16))
        off += r * c
    n_w = len(wts)
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

    vt = variant == "vt"
    consts = _plan_constants_vt(plan) if vt else gk._plan_constants(plan)
    grid_steps = padded // nt
    # cross-tile index-math pipeline (see VT_PIPELINE): needs a real next
    # tile to be useful, and the phase-ablation stages measure the
    # unpipelined structure
    pipe = vt and VT_PIPELINE and not ABLATE and grid_steps > 1

    kern = functools.partial(
        _kernel_vt if vt else _kernel,
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
        ablate=ABLATE,
        **({"pipeline": VT_PIPELINE if pipe else False, "fl": fl} if vt
           else {"variant": variant}),
    )

    if vt:
        # samples move to the lane dim: one XLA transpose per operand
        # OUTSIDE the kernel
        x = x.T
        targets = targets.T
        if pdf is not None:
            pdf = pdf.T
        if noise is not None:
            noise = noise.T
        vt_active = [
            l for l in range(plan.n_levels)
            if _level_active(plan, l, max_level)
        ]
        pick_args = list(_pick_consts_vt(plan, vt_active))
    else:
        pick_args = list(_pick_consts(plan)) if variant == "v3b" else []
    pick_specs = [
        pl.BlockSpec(a.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        for a in pick_args
    ]
    data_spec = (
        (lambda rows: pl.BlockSpec((rows, nt), lambda g: (0, g),
                                   memory_space=pltpu.VMEM))
        if vt
        else (lambda cols: pl.BlockSpec((nt, cols), lambda g: (g, 0),
                                        memory_space=pltpu.VMEM))
    )
    xn_specs = []
    if pipe:
        # the NEXT batch tile, for the pipelined index math (clamped at
        # the last instance - its park is dead work, ~4 us)
        last = grid_steps - 1
        xn_specs = [
            pl.BlockSpec(
                (x.shape[0], nt),
                lambda g: (0, jnp.minimum(g + 1, last)),
                memory_space=pltpu.VMEM,
            )
        ]
    in_specs = (
        [data_spec(x.shape[0] if vt else x.shape[1])]
        + xn_specs
        + [
            data_spec(out_dims),
            pl.BlockSpec(
                tbl_shape,
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
        + ([data_spec(out_dims)] if pdf is not None else [])
    )
    out_specs = (
        [
            pl.BlockSpec(
                tbl_shape,
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
        [jax.ShapeDtypeStruct(tbl_shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    )

    extra_args = []
    if pdf is not None:
        extra_args.append(pdf)
    if noise is not None:
        extra_args.append(noise)
        in_specs = in_specs + [
            data_spec(noise.shape[0] if vt else noise.shape[1])
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
    scratch_shapes = []
    if pipe:
        cnt = plan.n_corners * nt
        scratch_shapes = [
            pltpu.VMEM((plan.n_levels, cnt), jnp.int32),   # hi
            pltpu.VMEM((plan.n_levels, cnt), jnp.int32),   # lo
            pltpu.VMEM((plan.n_levels, cnt), jnp.float32),  # cw
        ]
    xn_args = (x,) if pipe else ()
    outs = pl.pallas_call(
        kern,
        grid=(grid_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=gk._VMEM_LIMIT,
    )(x, *xn_args, targets, table_packed, *pick_args,
      *gk._const_args(consts), *wts, *extra_args)

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

    genc = (
        gk.unpack_table_grads_fl(plan, gtable, int(enc_p.shape[0]))
        if fl
        else gk.unpack_table_grads(plan, gtable, int(enc_p.shape[0]))
    )
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
    nt = max(plan.batch_tile // IG_TILE_DIV, 128)
    c_nt = plan.n_corners * nt
    gtable_bytes = plan.h_total * 128 * plan.f * 4
    fl = _resolve_variant(plan) == "vt" and _use_fl(plan)
    est = (
        _cached_mask_bytes(
            plan, c_nt, oh_h=gk.fl_levels(plan)[1] if fl else None
        )
        + _table_bytes(plan)
        + gtable_bytes
    )
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


def _ig_kernel_vt(xT_ref, gyT_ref, table_ref, *rest, plan, mlp, n_weights,
                  enc_pad, fl=False):
    """The transposed (vt) input-gradient megakernel: _ig_kernel with
    samples on the lane dimension throughout - sublane picks instead of
    lane reduces, sublane-broadcast scatter rhs, transposed MLP, and the
    dy_dx contraction as sublane block reductions. Same math as
    _ig_kernel (grid.h:171-211 finite-corner-difference); enc rows are
    f-major (f*L + l), so the wrapper applies the _fm_row_perm W0
    permutation. Lane masks use the bcast build unconditionally (the
    train kernel's measured winner). fl: the f-on-lanes table packing
    (see VT_FL) - same trade as the train kernel's."""
    n_w = n_weights
    const_refs = rest[: len(gk._CONST_NAMES)]
    w_refs = rest[len(gk._CONST_NAMES) : len(gk._CONST_NAMES) + n_w]
    out_refs = rest[len(gk._CONST_NAMES) + n_w :]
    gtable_ref = out_refs[0]
    gw_refs = out_refs[1 : 1 + n_w]
    gxT_ref = out_refs[1 + n_w]

    cr = {name: ref[:] for name, ref in zip(gk._CONST_NAMES, const_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)
        for gw in gw_refs:
            gw[:] = jnp.zeros_like(gw)

    xT = xT_ref[:]
    gyT = gyT_ref[:].astype(jnp.float32)  # [out_pad, nt]
    nt = xT.shape[1]
    F, C, L, D = plan.f, plan.n_corners, plan.n_levels, plan.d
    cnt = C * nt

    lq = (LANE // F) if fl else LANE
    fl_geom = gk.fl_levels(plan)[0] if fl else None

    def _geom(l):
        if fl:
            return fl_geom[l]
        level = plan.levels[l]
        return level.row_off, level.h

    hiT, loT, cwT, termT, bitsT, derivT = _index_math_vt(
        plan, xT, cr, want_ig=True, lq=lq
    )

    def _lane_mask(l):
        iot = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)
        if fl:
            iot = iot // F
        return jnp.broadcast_to(loT[l : l + 1, :], (LANE, cnt)) == iot

    def _build(l, level):
        h = _geom(l)[1]
        hr = jnp.broadcast_to(hiT[l : l + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    # ---- gather: unweighted picks (shared with dy_dx) --------------------
    ohTs = [None] * L
    pick_rows = {}
    built = {0: _build(0, plan.levels[0])}
    for l, level in enumerate(plan.levels):
        if l + 1 < L:
            built[l + 1] = _build(l + 1, plan.levels[l + 1])
        ohT = built.pop(l)
        ohTs[l] = ohT  # cached for the scatter (per _ig_kernel's contract)
        off_l, h_l = _geom(l)
        tbl = table_ref[off_l : off_l + h_l, :]
        gT = jax.lax.dot_general(
            tbl, ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        maskl = _lane_mask(l)
        if fl:
            gm = jnp.where(maskl, gT, 0.0)
            red = gm[:8, :]
            for k in range(1, LANE // 8):
                red = red + gm[k * 8 : (k + 1) * 8, :]
            w = 8
            while w > F:
                w //= 2
                red = red[:w, :] + red[w:, :]
            for f in range(F):
                pick_rows[f * L + l] = red[f : f + 1, :]
            continue
        for f in range(F):
            gm_f = jnp.where(maskl, gT[f * LANE : (f + 1) * LANE, :], 0.0)
            pick_rows[f * L + l] = jnp.sum(gm_f, axis=0, keepdims=True)
    picked_t = jnp.concatenate(
        [pick_rows[r] for r in range(F * L)], axis=0
    )  # [F*L, C*nt], UNWEIGHTED (shared with dy_dx)

    cw_exp = jnp.concatenate([cwT] * F, axis=0)  # [F*L, C*nt]
    enc_w = picked_t * cw_exp
    encT = enc_w[:, :nt]
    for c in range(1, C):
        encT = encT + enc_w[:, c * nt : (c + 1) * nt]
    if enc_pad:
        encT = jnp.concatenate(
            [encT, jnp.zeros((enc_pad, nt), encT.dtype)], axis=0
        )

    # ---- fused MLP forward (recompute) + backward with external gy -------
    hT = encT.astype(jnp.bfloat16)
    hsT = [hT]
    for i in range(n_w):
        zT = jax.lax.dot_general(
            w_refs[i][:], hT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        hT = activation_fn(zT, act).astype(jnp.bfloat16)
        hsT.append(hT)

    gT = gyT
    for i in reversed(range(n_w)):
        act = mlp.output_activation if i == n_w - 1 else mlp.activation
        gT = activation_bwd_out(gT, hsT[i + 1].astype(jnp.float32), act)
        gw_refs[i][:] = gw_refs[i][:] + jax.lax.dot_general(
            hsT[i].astype(jnp.float32), gT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gT = jax.lax.dot_general(
            w_refs[i][:].astype(jnp.float32), gT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    gencT = gT[: L * F, :]  # [F*L, nt] f-major

    # ---- grid scatter (reusing ohTs; cw folded into the cotangent) -------
    gy_allu = jnp.concatenate([gencT] * C, axis=1)  # [F*L, C*nt] unweighted
    gy_all = gy_allu * cw_exp

    def _scatter_operands(l):
        maskl = _lane_mask(l)
        if fl:
            ct_l = jnp.concatenate(
                [gy_all[f * L + l : f * L + l + 1, :] for f in range(F)],
                axis=0,
            )
            tiled = jnp.concatenate([ct_l] * (LANE // F), axis=0)
            return jnp.where(maskl, tiled, 0.0).astype(jnp.bfloat16)
        rhs_rows = []
        for f in range(F):
            grow = gy_all[f * L + l : f * L + l + 1, :]
            rhs_rows.append(
                jnp.where(maskl, jnp.broadcast_to(grow, (LANE, cnt)), 0.0)
            )
        return jnp.concatenate(rhs_rows, axis=0).astype(jnp.bfloat16)

    pend = {0: _scatter_operands(0)}
    for l, level in enumerate(plan.levels):
        if l + 1 < L:
            pend[l + 1] = _scatter_operands(l + 1)
        contrib = jax.lax.dot_general(
            ohTs[l], pend.pop(l),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off_l, h_l = _geom(l)
        sl = slice(off_l, off_l + h_l)
        gtable_ref[sl, :] = gtable_ref[sl, :] + contrib

    # ---- dy_dx contraction (transposed) -----------------------------------
    # dot[l, :] = sum_f picked(f,l) * genc(f,l): sublane block reduction
    prod = picked_t * gy_allu  # [F*L, C*nt]
    dotT = prod[:L, :]
    for f in range(1, F):
        dotT = dotT + prod[f * L : (f + 1) * L, :]  # [L, C*nt]

    gx_rows = []
    for d in range(D):
        # sgn * prod_{d2 != d} term_{d2}: all [L, C*nt] row blocks
        sgnT = 2.0 * bitsT[d * L : (d + 1) * L, :] - 1.0
        other = None
        for d2 in range(D):
            if d2 == d:
                continue
            t2 = termT[d2 * L : (d2 + 1) * L, :]
            other = t2 if other is None else other * t2
        if other is None:
            other = jnp.ones_like(sgnT)
        deriv_exp = jnp.concatenate(
            [derivT[d * L : (d + 1) * L, :]] * C, axis=1
        )
        contrib = dotT * (sgnT * other) * deriv_exp  # [L, C*nt]
        row = jnp.sum(contrib, axis=0, keepdims=True)  # [1, C*nt]
        acc = row[:, :nt]
        for c in range(1, C):
            acc = acc + row[:, c * nt : (c + 1) * nt]
        gx_rows.append(acc)
    gxT_ref[:] = jnp.concatenate(gx_rows, axis=0).astype(gxT_ref.dtype)


def fused_ig_grads(model, params, x, gy):
    """(grads_flat, gx) via the fused input-gradient backward kernel.
    gy: [B, out_pad] output cotangent (raw - the caller owns any loss
    scale). Runs the transposed (vt) kernel when the plan resolves to it
    (standard interpolated dense path); Rng-hash plans keep the
    row-major kernel (ext operand machinery)."""
    plan = model.encoding._kernel_plan()
    mlp = model.network
    enc = model.encoding
    n_net = mlp.n_params
    enc_pad = enc.padded_output_width - plan.out_width
    net_p, enc_p = params[:n_net], params[n_net:]
    vt = _resolve_variant(plan) == "vt"
    fl = vt and _use_fl(plan)
    table_packed = (
        gk.repack_table_fl(plan, enc_p) if fl else gk.repack_table(plan, enc_p)
    )
    tbl_shape = tuple(table_packed.shape)
    wts = []
    off = 0
    for r, c in mlp.layer_sizes():
        wts.append(
            net_p[off : off + r * c].reshape(r, c).T.astype(jnp.bfloat16)
        )
        off += r * c
    n_w = len(wts)
    w0_inv = None
    if vt:
        perm, w0_inv = _fm_row_perm(plan, int(wts[0].shape[0]))
        wts[0] = wts[0][perm, :]

    b = x.shape[0]
    d_in = x.shape[1]
    nt = max(plan.batch_tile // IG_TILE_DIV, 128)
    padded = -(-b // nt) * nt
    if padded != b:
        x = jnp.pad(x, ((0, padded - b), (0, 0)))
        gy = jnp.pad(gy, ((0, padded - b), (0, 0)))

    consts = _plan_constants_vt(plan) if vt else gk._plan_constants(plan)
    out_w = mlp.padded_output_width
    if vt:
        x = x.T
        gy = gy.T
        ext_specs, ext_args = [], []
        data_spec = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, nt), lambda g: (0, g), memory_space=pltpu.VMEM
        )
        x_spec, gy_spec = data_spec(d_in), data_spec(out_w)
        gx_spec = data_spec(d_in)
        gx_shape = jax.ShapeDtypeStruct((d_in, padded), jnp.float32)
        kern = functools.partial(_ig_kernel_vt, fl=fl)
    else:
        ext_specs, ext_args = gk._ext_specs_args(plan, x, nt=nt)
        x_spec = pl.BlockSpec((nt, d_in), lambda g: (g, 0),
                              memory_space=pltpu.VMEM)
        gy_spec = pl.BlockSpec((nt, out_w), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)
        gx_spec = pl.BlockSpec((nt, d_in), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)
        gx_shape = jax.ShapeDtypeStruct((padded, d_in), jnp.float32)
        kern = _ig_kernel

    in_specs = (
        [
            x_spec,
            gy_spec,
            pl.BlockSpec(
                tbl_shape, lambda g: (0, 0),
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
                tbl_shape, lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ]
        + [gx_spec]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(tbl_shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [gx_shape]
    )
    outs = pl.pallas_call(
        functools.partial(
            kern, plan=plan, mlp=mlp, n_weights=n_w, enc_pad=enc_pad
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
    if w0_inv is not None:
        gwts = [gwts[0][w0_inv, :]] + list(gwts[1:])
    gx = outs[1 + n_w].T[:b] if vt else outs[1 + n_w][:b]
    genc = (
        gk.unpack_table_grads_fl(plan, gtable, int(enc_p.shape[0]))
        if fl
        else gk.unpack_table_grads(plan, gtable, int(enc_p.shape[0]))
    )
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
