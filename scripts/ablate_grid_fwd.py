"""Ablate the grid fwd kernel to find the real bottleneck."""

import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tcnn_tpu as tc
import tcnn_tpu.ops.pallas.grid_kernel as gk

LANE = 128
B = 1 << 18
NT = 1024


def make_kernel(mode):
    def kern(x_ref, table_ref, *const_and_out, plan):
        const_refs, y_ref = const_and_out[:-1], const_and_out[-1]
        cr = {n: r[:] for n, r in zip(gk._CONST_NAMES, const_refs)}
        x = x_ref[:]
        nt = x.shape[0]
        F, C = plan.f, plan.n_corners

        cells, w = gk._positions(plan, x, cr)
        if mode == "idx_only":
            per_corner = gk._corner_indices_and_weights(plan, cells, w, cr)
            acc = jnp.zeros((nt, 1), jnp.float32)
            for idx, cw in per_corner:
                acc = acc + jnp.sum(
                    idx.astype(jnp.float32) * cw, axis=1, keepdims=True
                )
            y_ref[:] = jnp.broadcast_to(acc, y_ref.shape).astype(y_ref.dtype)
            return
        per_corner = gk._corner_indices_and_weights(plan, cells, w, cr)

        cols = []
        for l, level in enumerate(plan.levels):
            hi = jnp.concatenate(
                [idx[:, l : l + 1] >> 7 for idx, _ in per_corner], axis=0
            )
            lo = jnp.concatenate(
                [idx[:, l : l + 1] & (LANE - 1) for idx, _ in per_corner],
                axis=0,
            )
            if mode == "stack_only":
                v = (hi + lo).astype(jnp.float32)
                cols.append(
                    jnp.concatenate([v] * F, 1).reshape(C, nt, F).sum(0)
                )
                continue
            oh = (
                hi
                == jax.lax.broadcasted_iota(jnp.int32, (C * nt, level.h), 1)
            ).astype(jnp.bfloat16)
            if mode == "oh_only":
                v = jnp.sum(oh.astype(jnp.float32), 1, keepdims=True)
                cols.append(
                    jnp.concatenate([v] * F, 1).reshape(C, nt, F).sum(0)
                )
                continue
            tbl = table_ref[level.row_off : level.row_off + level.h, :]
            g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            if mode == "no_pick":
                picked = jnp.concatenate(
                    [g[:, f * LANE : f * LANE + 1] for f in range(F)], 1
                )
            else:
                lo_b = jnp.broadcast_to(lo, (C * nt, LANE))
                picked = jnp.concatenate(
                    [
                        jnp.take_along_axis(
                            g[:, f * LANE : (f + 1) * LANE], lo_b, axis=1
                        )[:, :1]
                        for f in range(F)
                    ],
                    axis=1,
                )
            cw = jnp.concatenate(
                [w_[:, l : l + 1] for _, w_ in per_corner], axis=0
            )
            picked = picked * cw
            cols.append(picked.reshape(C, nt, F).sum(0))
        y_ref[:] = jnp.concatenate(cols, axis=1).astype(y_ref.dtype)

    return kern


def run(mode, plan, table_packed, x):
    consts = gk._plan_constants(plan)
    f = pl.pallas_call(
        functools.partial(make_kernel(mode), plan=plan),
        grid=(B // NT,),
        in_specs=[
            pl.BlockSpec((NT, 2), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (plan.h_total, LANE * plan.f),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + gk._const_specs(consts),
        out_specs=pl.BlockSpec(
            (NT, plan.out_width), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, plan.out_width), jnp.bfloat16),
        compiler_params=gk._VMEM_LIMIT,
    )
    jf = jax.jit(lambda t, xx: f(xx, t, *gk._const_args(consts)))
    t0 = time.time()
    y = jf(table_packed, x)
    jax.block_until_ready(y)
    tc_ = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        y = jf(table_packed, x)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / 20
    print(f"{mode:12s}: {dt*1e3:7.2f} ms  (compile {tc_:.0f}s)")


def main():
    cfg = tc.load_config("/root/repo/data/config_hash.json")
    model = tc.create_from_config(2, 3, cfg)
    enc = model.network.encoding
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=NT)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    table_packed = jax.jit(lambda p: gk.repack_table(plan, p))(params)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    for mode in ["idx_only", "stack_only", "oh_only", "no_pick", "full"]:
        run(mode, plan, table_packed, x)


if __name__ == "__main__":
    main()
