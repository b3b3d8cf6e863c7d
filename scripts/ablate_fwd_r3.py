"""Round-3 ablation of the grid fwd kernel stages (packed-math version).

Modes accumulate: idx -> masks -> matmul -> full. The delta between
consecutive modes isolates each stage's cost at b=2^18, tile 1024.
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


def make_kernel(mode):
    def kern(x_ref, table_ref, *const_and_out, plan):
        const_refs, y_ref = const_and_out[:-1], const_and_out[-1]
        cr = {n: r[:] for n, r in zip(gk._CONST_NAMES, const_refs)}
        x = x_ref[:]
        nt = x.shape[0]
        F, C, L = plan.f, plan.n_corners, plan.n_levels

        cells, w = gk._positions(plan, x, cr)
        hi_cl, lo_cl, cw_cl = gk._stacked_hi_lo_w_v2(plan, cells, w, cr)
        if mode == "idx":
            v = (hi_cl + lo_cl).astype(jnp.float32) * cw_cl
            acc = jnp.sum(v, axis=1, keepdims=True)  # [C*Nt, 1]
            acc = acc.reshape(C, nt, 1).sum(axis=0)  # [Nt, 1]
            y_ref[:] = jnp.broadcast_to(acc, y_ref.shape).astype(y_ref.dtype)
            return

        cols = [[] for _ in range(F)]
        for l, level in enumerate(plan.levels):
            oh, ohlo_w = gk._level_masks(
                plan, hi_cl, lo_cl, cw_cl, l, level.h, nt
            )
            if mode == "masks":
                v = jnp.sum(
                    oh.astype(jnp.float32)[:, :1] + ohlo_w[:, :1],
                    axis=1, keepdims=True,
                )
                for f in range(F):
                    cols[f].append(v)
                continue
            tbl = table_ref[level.row_off : level.row_off + level.h, :]
            g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            if mode == "matmul":
                for f in range(F):
                    cols[f].append(g[:, f * LANE : f * LANE + 1] + ohlo_w[:, :1])
                continue
            for f in range(F):
                cols[f].append(
                    jnp.sum(
                        g[:, f * LANE : (f + 1) * LANE] * ohlo_w,
                        axis=1, keepdims=True,
                    )
                )
        picked = jnp.concatenate(sum(cols, []), axis=1)
        y_ref[:] = (
            picked.reshape(C, nt, F * L).sum(axis=0).astype(y_ref.dtype)
        )

    return kern


def run(plan, table_packed, x, mode):
    b = x.shape[0]
    nt = plan.batch_tile
    consts = gk._plan_constants(plan)
    f = pl.pallas_call(
        functools.partial(make_kernel(mode), plan=plan),
        grid=(b // nt,),
        in_specs=[
            pl.BlockSpec((nt, x.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.h_total, LANE * plan.f), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + gk._const_specs(consts),
        out_specs=pl.BlockSpec((nt, plan.out_width), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, plan.out_width), jnp.bfloat16),
        compiler_params=gk._VMEM_LIMIT,
    )
    return f(x, table_packed, *gk._const_args(consts))


def main():
    config = tc.load_config("/root/repo/data/config_hash.json")
    m = tc.create_from_config(2, 3, config)
    enc = m.network.encoding
    plan = enc._kernel_plan()
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    table = jax.jit(lambda p: gk.repack_table(plan, p))(params)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)

    for mode in (sys.argv[1:] or ["idx", "masks", "matmul", "full"]):
        f = jax.jit(functools.partial(run, plan, mode=mode))
        r = f(table, x)
        np.asarray(r.reshape(-1)[:1])
        t0 = time.perf_counter()
        for _ in range(40):
            r = f(table, x)
        np.asarray(r.reshape(-1)[:1])
        dt = (time.perf_counter() - t0 - 0.03) / 40
        print(f"{mode}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
