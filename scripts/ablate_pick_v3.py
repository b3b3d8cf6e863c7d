"""Round-3b ablation: move the lane-pick's broadcast/reduce traffic to the MXU.

The measured fwd decomposition (ablate_fwd_r3.py) is 9.0 ms hi-build+matmul
+ 6.3 ms ohlo mask build + 7.6 ms weighted pick: the VPU passes are the
bottleneck, and 4 of the ~8 per-level passes are thin-column broadcasts
(lo, cw -> 128 lanes) and thin-column reduce outputs. Variants measured:

  base   current production kernel stages (reference point)
  cwend  drop the cw broadcast: unweighted 0/1 mask, weight applied as ONE
         wide [C*Nt, F*L] multiply after the pick
  v3a    cwend + lo broadcast via ONE bf16 matmul against a constant
         expansion matrix E [L, 128L] (lo <= 127 is bf16-exact), shared
         f32 compare for all levels
  v3b    v3a + pick-reduce via per-level [128F, FL] selection matmuls
         (masked g rows are single bf16 table entries -> bf16 cast exact),
         accumulated into [C*Nt, F*L]: no thin columns, no lane concats

Run on the real chip: python scripts/ablate_pick_v3.py [variants...]
"""
import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
import tcnn_tpu.ops.pallas.grid_kernel as gk

LANE = 128
B = 1 << 18


def expansion_consts(plan):
    """E [L, 128L] bf16 (E[l, l*128+j]=1), iota row [1, 128L] f32 (j%128),
    S [L*128F, FL] bf16 (S[l*128F + f*128 + j, f*L + l] = 1)."""
    L, F = plan.n_levels, plan.f
    E = np.zeros((L, L * LANE), np.float32)
    for l in range(L):
        E[l, l * LANE : (l + 1) * LANE] = 1.0
    iota = np.tile(np.arange(LANE, dtype=np.float32), L)[None, :]
    S = np.zeros((L * LANE * F, F * L), np.float32)
    for l in range(L):
        for f in range(F):
            for j in range(LANE):
                S[l * LANE * F + f * LANE + j, f * L + l] = 1.0
    return (
        jnp.asarray(E, jnp.bfloat16),
        jnp.asarray(iota, jnp.float32),
        jnp.asarray(S, jnp.bfloat16),
    )


def make_kernel(variant):
    def kern(x_ref, table_ref, e_ref, iota_ref, s_ref, *const_and_out, plan):
        const_refs, y_ref = const_and_out[:-1], const_and_out[-1]
        cr = {n: r[:] for n, r in zip(gk._CONST_NAMES, const_refs)}
        x = x_ref[:]
        nt = x.shape[0]
        F, C, L = plan.f, plan.n_corners, plan.n_levels

        cells, w = gk._positions(plan, x, cr)
        hi_cl, lo_cl, cw_cl = gk._stacked_hi_lo_w_v2(plan, cells, w, cr)
        rows = C * nt

        if variant in ("v3a", "v3b"):
            lo_b = jnp.dot(
                lo_cl.astype(jnp.bfloat16), e_ref[:],
                preferred_element_type=jnp.float32,
            )  # [rows, 128L]
            mask_all = lo_b == iota_ref[:]  # [rows, 128L] i1

        if variant == "v3b":
            picked = jnp.zeros((rows, F * L), jnp.float32)
        else:
            cols = [[] for _ in range(F)]

        for l, level in enumerate(plan.levels):
            oh = (
                hi_cl[:, l : l + 1]
                == jax.lax.broadcasted_iota(jnp.int32, (rows, level.h), 1)
            ).astype(jnp.bfloat16)
            tbl = table_ref[level.row_off : level.row_off + level.h, :]
            g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)

            if variant == "base":
                lmask = lo_cl[:, l : l + 1] == jax.lax.broadcasted_iota(
                    jnp.int32, (rows, LANE), 1
                )
                ohlo = jnp.where(lmask, cw_cl[:, l : l + 1], 0.0)
                for f in range(F):
                    cols[f].append(
                        jnp.sum(g[:, f * LANE : (f + 1) * LANE] * ohlo,
                                axis=1, keepdims=True)
                    )
                continue

            if variant == "cwend":
                lmask = lo_cl[:, l : l + 1] == jax.lax.broadcasted_iota(
                    jnp.int32, (rows, LANE), 1
                )
            else:
                lmask = mask_all[:, l * LANE : (l + 1) * LANE]

            if variant == "v3b":
                # per-f bool selects + f32 concat (i1 lane-concat is a
                # Mosaic relayout hazard); masked rows are exact bf16
                gm = jnp.concatenate(
                    [
                        jnp.where(lmask, g[:, f * LANE : (f + 1) * LANE], 0.0)
                        for f in range(F)
                    ],
                    axis=1,
                ).astype(jnp.bfloat16)
                picked = picked + jnp.dot(
                    gm,
                    s_ref[l * LANE * F : (l + 1) * LANE * F, :],
                    preferred_element_type=jnp.float32,
                )
            else:
                for f in range(F):
                    gm = jnp.where(lmask, g[:, f * LANE : (f + 1) * LANE], 0.0)
                    cols[f].append(jnp.sum(gm, axis=1, keepdims=True))

        if variant == "base":
            picked = jnp.concatenate(sum(cols, []), axis=1)
        elif variant != "v3b":
            picked = jnp.concatenate(sum(cols, []), axis=1)
            picked = picked * jnp.concatenate([cw_cl] * F, axis=1)
        else:
            picked = picked * jnp.concatenate([cw_cl] * F, axis=1)

        y_ref[:] = picked.reshape(C, nt, F * L).sum(axis=0).astype(y_ref.dtype)

    return kern


def run(plan, table_packed, e, iota, s, x, variant):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = gk._plan_constants(plan)
    f = pl.pallas_call(
        functools.partial(make_kernel(variant), plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.h_total, LANE * plan.f), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(e.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(iota.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
        ]
        + gk._const_specs(consts),
        out_specs=pl.BlockSpec((nt, plan.out_width), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, plan.out_width), jnp.bfloat16),
        compiler_params=gk._VMEM_LIMIT,
    )
    return f(x, table_packed, e, iota, s, *gk._const_args(consts))


def main():
    config = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    enc = m.network.encoding
    plan = enc._kernel_plan()
    e, iota, s = expansion_consts(plan)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    table = jax.jit(lambda p: gk.repack_table(plan, p))(params)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)

    ref = None
    for variant in (sys.argv[1:] or ["base", "cwend", "v3a", "v3b"]):
        f = jax.jit(functools.partial(run, plan, variant=variant))
        r = f(table, e, iota, s, x)
        np.asarray(r.reshape(-1)[:1])
        if variant == "base":
            ref = np.asarray(r, np.float32)
        elif ref is not None:
            got = np.asarray(r, np.float32)
            err = np.max(np.abs(got - ref))
            print(f"  {variant} max|diff| vs base = {err:.3e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(40):
            r = f(table, e, iota, s, x)
        np.asarray(r.reshape(-1)[:1])
        dt = (time.perf_counter() - t0 - 0.03) / 40
        print(f"{variant}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
