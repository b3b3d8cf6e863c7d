"""f-on-lanes ("fl") layout probe for the vt train kernel's encoding loop.

PERF.md round 5 root-caused the vt step's 4.7 ms over its matmul
roofline to the pick's intrinsic gT traffic: the gather matmul
materializes gT [128F, C*nt] f32 (2 MB/level at nt=512) and the pick
reads it back - ~33 GB/step write+read at F=2.

dense_ext_kernel.py already ships the fix for PPNG2/3: pack tables
with lane = (row % LQ) * F + f, LQ = 128 // F, so the candidate block
is gT [128, C*nt] - HALF the f32 traffic at F=2 - and ONE mask pass
picks all F features (the current layout pays F where passes). The
price: hi = row // LQ doubles the one-hot height (2x build compares +
2x bf16 oh traffic). Whether the trade wins on the REAL config_hash
level structure is what this probe measures: the full standalone
encoding loop (oh build + gather + pick + scatter rhs build + scatter
matmul + gtable accumulate) in both layouts, plus the gather+pick-only
subset (the inference-side cost).

Variants measured for the fl pick reduce and rhs build (Mosaic sublane
alignment matters):
  pick  tree  = 8-aligned slab partial sums then log-fold (16+2 adds)
        slab  = dense_ext's stride-F walk (63 unaligned 2-row adds)
  rhs   tile  = dense_ext's concat of LQ copies of ct [F, cnt]
        bcast = F sublane broadcasts masked to (lane_slab & r%F==f)

MEASURED (v5e, 2026-08-20): cur full loop 20.17 ms; fl tree/tile
18.85, tree/bcast 19.45, slab/tile 19.18; gather+pick cur 11.91,
fl tree 11.11, fl slab 11.34. Winner tree/tile -> shipped as
train_kernel.VT_FL (end-to-end: train step 19.64 -> 18.20 ms).
"""
import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.ops.pallas import grid_kernel as gk  # noqa: E402

LANE = 128
NT = 512
F = 2
LQ = LANE // F


def _kern_cur(hi_ref, lo_ref, gy_ref, table_ref, gtable_ref, o_ref, *,
              levels, scatter):
    """Current layout: table [h, 128F], gT [128F, cnt], F pick passes."""
    cnt = hi_ref.shape[1]
    dep = jnp.float32(0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)

    def _lane_mask(i):
        return jnp.broadcast_to(lo_ref[i : i + 1, :], (LANE, cnt)) == iota

    def _build(i, off, h):
        hr = jnp.broadcast_to(hi_ref[i : i + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    ohs = [None] * len(levels)
    built = {0: _build(0, *levels[0])}
    pick_rows = []
    for i, (off, h) in enumerate(levels):
        if i + 1 < len(levels):
            built[i + 1] = _build(i + 1, *levels[i + 1])
        ohT = built.pop(i)
        ohs[i] = ohT
        gT = jax.lax.dot_general(
            table_ref[off : off + h, :], ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        maskl = _lane_mask(i)
        for f in range(F):
            gm = jnp.where(maskl, gT[f * LANE : (f + 1) * LANE, :], 0.0)
            pick_rows.append(jnp.sum(gm, axis=0, keepdims=True))
    dep = dep + jnp.sum(jnp.concatenate(pick_rows, axis=0))

    if scatter:
        for i, (off, h) in enumerate(levels):
            maskl = _lane_mask(i)
            rhs_rows = []
            for f in range(F):
                grow = gy_ref[i * F + f : i * F + f + 1, :]
                rhs_rows.append(
                    jnp.where(maskl, jnp.broadcast_to(grow, (LANE, cnt)),
                              0.0)
                )
            rhsT = jnp.concatenate(rhs_rows, axis=0).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                ohs[i], rhsT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gtable_ref[off : off + h, :] = (
                gtable_ref[off : off + h, :] + contrib
            )
    o_ref[0, 0] = dep


def _kern_fl(hi_ref, lo_ref, gy_ref, table_ref, gtable_ref, o_ref, *,
             levels, scatter, pickv, rhsv):
    """f-on-lanes: table [h, 128] (lane = (row%LQ)*F + f), gT [128, cnt],
    one mask pass picks all F features."""
    cnt = hi_ref.shape[1]
    dep = jnp.float32(0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)
    iota_f = iota // F
    iota_m = iota % F

    def _lane_mask(i):
        return jnp.broadcast_to(lo_ref[i : i + 1, :], (LANE, cnt)) == iota_f

    def _build(i, off, h):
        hr = jnp.broadcast_to(hi_ref[i : i + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    def _reduce(gm):
        if pickv == "slab":
            picked = gm[:F, :]
            for s in range(1, LQ):
                picked = picked + gm[s * F : (s + 1) * F, :]
            return picked
        # tree: 8-aligned slab sums then fold 8 -> F
        s8 = gm[:8, :]
        for k in range(1, LANE // 8):
            s8 = s8 + gm[k * 8 : (k + 1) * 8, :]
        w = 8
        while w > F:
            w //= 2
            s8 = s8[:w, :] + s8[w:, :]
        return s8

    ohs = [None] * len(levels)
    built = {0: _build(0, *levels[0])}
    pick_rows = []
    for i, (off, h) in enumerate(levels):
        if i + 1 < len(levels):
            built[i + 1] = _build(i + 1, *levels[i + 1])
        ohT = built.pop(i)
        ohs[i] = ohT
        gT = jax.lax.dot_general(
            table_ref[off : off + h, :], ohT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gm = jnp.where(_lane_mask(i), gT, 0.0)
        pick_rows.append(_reduce(gm))  # [F, cnt]
    dep = dep + jnp.sum(jnp.concatenate(pick_rows, axis=0))

    if scatter:
        for i, (off, h) in enumerate(levels):
            maskl = _lane_mask(i)
            ct_l = gy_ref[i * F : (i + 1) * F, :]
            if rhsv == "tile":
                tiled = jnp.concatenate([ct_l] * LQ, axis=0)
                rhsT = jnp.where(maskl, tiled, 0.0).astype(jnp.bfloat16)
            else:  # bcast: F sublane broadcasts, masked to slab & f-row
                rhsT = jnp.zeros((LANE, cnt), jnp.float32)
                for f in range(F):
                    grow = jnp.broadcast_to(ct_l[f : f + 1, :], (LANE, cnt))
                    rhsT = rhsT + jnp.where(
                        maskl & (iota_m == f), grow, 0.0
                    )
                rhsT = rhsT.astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                ohs[i], rhsT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gtable_ref[off : off + h, :] = (
                gtable_ref[off : off + h, :] + contrib
            )
    o_ref[0, 0] = dep


def run(levels, fl, scatter, pickv="tree", rhsv="tile", steps=512):
    h_total = sum(h for _, h in levels)
    L = len(levels)
    cnt = 4 * NT
    lanes = LANE if fl else LANE * F
    rng = np.random.default_rng(0)
    hmax = max(h for _, h in levels)
    hi = jnp.asarray(rng.integers(0, hmax, size=(L, cnt)) % np.asarray(
        [[h] for _, h in levels]), jnp.int32)
    lo = jnp.asarray(
        rng.integers(0, LQ if fl else LANE, size=(L, cnt)), jnp.int32
    )
    gy = jnp.asarray(rng.normal(size=(L * F, cnt)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(h_total, lanes)), jnp.bfloat16)
    if fl:
        kern = functools.partial(_kern_fl, levels=levels, scatter=scatter,
                                 pickv=pickv, rhsv=rhsv)
    else:
        kern = functools.partial(_kern_cur, levels=levels, scatter=scatter)
    whole = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[whole(hi.shape), whole(lo.shape), whole(gy.shape),
                  whole(table.shape)],
        out_specs=[whole((h_total, lanes)),
                   pl.BlockSpec((1, 1), lambda g: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((h_total, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        compiler_params=gk._VMEM_LIMIT,
    )(*a))
    o = f(hi, lo, gy, table)
    np.asarray(o[1])
    t0 = time.time()
    for _ in range(10):
        o = f(hi, lo, gy, table)
    np.asarray(o[1])
    return (time.time() - t0) / 10


def main():
    tm = tc.create_from_config(
        2, 3, tc.load_config("/root/repo/data/config_hash.json")
    )
    plan = tm.network.encoding._kernel_plan()
    levels = [(lv.row_off, lv.h) for lv in plan.levels]
    # fl level structure: h doubles (LQ = 64 rows/sublane-row at F=2),
    # offsets rebuilt
    lf, off = [], 0
    for _, h in levels:
        lf.append((off, 2 * h))
        off += 2 * h
    print(f"levels: {len(levels)}, h_total {sum(h for _, h in levels)} "
          f"(fl {off}), nt={NT}, 512 grid steps = b 2^18", flush=True)
    cases = [
        ("cur  full loop (g+p+s)", dict(levels=levels, fl=False,
                                        scatter=True)),
        ("fl   full loop tree/tile", dict(levels=lf, fl=True, scatter=True,
                                          pickv="tree", rhsv="tile")),
        ("fl   full loop tree/bcast", dict(levels=lf, fl=True, scatter=True,
                                           pickv="tree", rhsv="bcast")),
        ("fl   full loop slab/tile", dict(levels=lf, fl=True, scatter=True,
                                          pickv="slab", rhsv="tile")),
        ("cur  gather+pick only", dict(levels=levels, fl=False,
                                       scatter=False)),
        ("fl   gather+pick tree", dict(levels=lf, fl=True, scatter=False,
                                       pickv="tree")),
        ("fl   gather+pick slab", dict(levels=lf, fl=True, scatter=False,
                                       pickv="slab")),
    ]
    for name, kw in cases:
        try:
            dt = run(**kw)
            print(f"{name:30s}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s}: FAILED {type(e).__name__} {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
