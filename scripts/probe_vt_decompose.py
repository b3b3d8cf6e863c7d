"""Knockout decomposition of the vt train kernel's encoding phases.

The cumulative phase ablation (ABLATE) truncates the kernel, which lets
Mosaic shrink earlier phases - its deltas misattribute costs (round 5:
dropping the index math entirely saves 0.15 ms, not the 2.0 ms the
ablation reported). This probe instead rebuilds the per-level
gather+pick+scatter loop standalone at production shapes (the REAL
config_hash level structure, nt=512) and knocks individual pieces out
while keeping everything else in production form:

  ohmode:  build = production one-hot build | input = pre-materialized
           VMEM constant (isolates the build VPU passes)
  pick:    sum = production where+sublane-reduce | slice = minimal gT
           consumption (8 rows) | none
  scatter: full = lane-mask rebuild + rhs build + matmul + gtable
           accumulate | mmonly = matmul from a constant rhs | none

All variants keep the matmuls live via a dependent scalar output.
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


def _kern(hi_ref, lo_ref, gy_ref, table_ref, oh_ref, rhs_ref, gtable_ref,
          o_ref, *, levels, ohmode, pick, scatter):
    cnt = hi_ref.shape[1]
    dep = jnp.float32(0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtable_ref[:] = jnp.zeros_like(gtable_ref)

    def _build(i, off, h):
        if ohmode == "input":
            return oh_ref[off : off + h, :]
        hr = jnp.broadcast_to(hi_ref[i : i + 1, :], (h, cnt))
        return (
            hr == jax.lax.broadcasted_iota(jnp.int32, (h, cnt), 0)
        ).astype(jnp.bfloat16)

    def _lane_mask(i):
        return jnp.broadcast_to(lo_ref[i : i + 1, :], (LANE, cnt)) == (
            jax.lax.broadcasted_iota(jnp.int32, (LANE, cnt), 0)
        )

    ohs = [None] * len(levels)
    built = {0: _build(0, levels[0][0], levels[0][1])}
    pick_rows = []
    for i, (off, h) in enumerate(levels):
        if i + 1 < len(levels):
            built[i + 1] = _build(i + 1, *levels[i + 1])
        ohT = built.pop(i)
        ohs[i] = ohT
        tbl = table_ref[off : off + h, :]
        gT = jax.lax.dot_general(
            tbl, ohT, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if pick == "sum":
            maskl = _lane_mask(i)
            for f in range(F):
                gm = jnp.where(maskl, gT[f * LANE : (f + 1) * LANE, :], 0.0)
                pick_rows.append(jnp.sum(gm, axis=0, keepdims=True))
        elif pick == "slice":
            dep = dep + jnp.sum(gT[:8, :])
        else:
            dep = dep + gT[0, 0]
    if pick == "sum":
        picked = jnp.concatenate(pick_rows, axis=0)
        dep = dep + jnp.sum(picked)

    if scatter != "none":
        for i, (off, h) in enumerate(levels):
            if scatter == "full":
                maskl = _lane_mask(i)
                rhs_rows = []
                for f in range(F):
                    grow = gy_ref[i * F + f : i * F + f + 1, :]
                    rhs_rows.append(
                        jnp.where(maskl,
                                  jnp.broadcast_to(grow, (LANE, cnt)), 0.0)
                    )
                rhsT = jnp.concatenate(rhs_rows, axis=0).astype(jnp.bfloat16)
            else:
                rhsT = rhs_ref[:]
            contrib = jax.lax.dot_general(
                ohs[i], rhsT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gtable_ref[off : off + h, :] = gtable_ref[off : off + h, :] + contrib
    o_ref[0, 0] = dep


def run(levels, ohmode, pick, scatter, steps=512):
    h_total = sum(h for _, h in levels)
    L = len(levels)
    cnt = 4 * NT
    rng = np.random.default_rng(0)
    hi = jnp.asarray(
        rng.integers(0, 128, size=(L, cnt)), jnp.int32
    )  # valid rows for every level
    lo = jnp.asarray(rng.integers(0, LANE, size=(L, cnt)), jnp.int32)
    gy = jnp.asarray(rng.normal(size=(L * F, cnt)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(h_total, LANE * F)), jnp.bfloat16)
    oh = jnp.zeros((h_total, cnt), jnp.bfloat16)
    rhs = jnp.asarray(rng.normal(size=(LANE * F, cnt)), jnp.bfloat16)
    kern = functools.partial(_kern, levels=levels, ohmode=ohmode,
                             pick=pick, scatter=scatter)
    whole = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[whole(hi.shape), whole(lo.shape), whole(gy.shape),
                  whole(table.shape), whole(oh.shape), whole(rhs.shape)],
        out_specs=[whole((h_total, LANE * F)),
                   pl.BlockSpec((1, 1), lambda g: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((h_total, LANE * F), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        compiler_params=gk._VMEM_LIMIT,
    )(*a))
    o = f(hi, lo, gy, table, oh, rhs)
    np.asarray(o[1])
    t0 = time.time()
    for _ in range(10):
        o = f(hi, lo, gy, table, oh, rhs)
    np.asarray(o[1])
    return (time.time() - t0) / 10


def main():
    tm = tc.create_from_config(
        2, 3, tc.load_config("/root/repo/data/config_hash.json")
    )
    plan = tm.network.encoding._kernel_plan()
    levels = [(lv.row_off, lv.h) for lv in plan.levels]
    print(f"levels: {len(levels)}, h_total {sum(h for _, h in levels)}, "
          f"nt={NT} (cnt {4*NT}), 512 grid steps = b 2^18", flush=True)
    cases = [
        ("matmuls only (oh input, no pick, mm-only scatter)",
         dict(ohmode="input", pick="none", scatter="mmonly")),
        ("+ oh builds", dict(ohmode="build", pick="none", scatter="mmonly")),
        ("+ pick", dict(ohmode="build", pick="sum", scatter="mmonly")),
        ("+ rhs builds (FULL loop)",
         dict(ohmode="build", pick="sum", scatter="full")),
        ("gather only, oh input", dict(ohmode="input", pick="none",
                                       scatter="none")),
        ("gather only, oh built", dict(ohmode="build", pick="none",
                                       scatter="none")),
        ("gather+pick, oh built", dict(ohmode="build", pick="sum",
                                       scatter="none")),
    ]
    for name, kw in cases:
        try:
            dt = run(levels, **kw)
            print(f"{name:48s}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:48s}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
