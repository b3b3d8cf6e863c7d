"""Compare pick strategies for the grid fwd kernel on TPU."""

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
        F, C, L = plan.f, plan.n_corners, plan.n_levels

        cells, w = gk._positions(plan, x, cr)
        hi, lo, cw = gk._stacked_hi_lo_w(plan, cells, w, cr)

        cols = [[] for _ in range(F)]
        acc = None
        for l, level in enumerate(plan.levels):
            oh = (
                hi[:, l : l + 1]
                == jax.lax.broadcasted_iota(jnp.int32, (C * nt, level.h), 1)
            ).astype(jnp.bfloat16)
            tbl = table_ref[level.row_off : level.row_off + level.h, :]
            g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            if mode == "gather":
                lo_b = jnp.broadcast_to(lo[:, l : l + 1], (C * nt, LANE))
                for f in range(F):
                    cols[f].append(
                        jnp.take_along_axis(
                            g[:, f * LANE : (f + 1) * LANE], lo_b, axis=1
                        )[:, :1]
                    )
            elif mode == "mulreduce":
                ohlo = (
                    lo[:, l : l + 1]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (C * nt, LANE), 1
                    )
                ).astype(jnp.float32)
                for f in range(F):
                    cols[f].append(
                        jnp.sum(
                            g[:, f * LANE : (f + 1) * LANE] * ohlo,
                            axis=1,
                            keepdims=True,
                        )
                    )
            elif mode == "matreduce":
                # reduce via MXU: (g*ohlo2) @ ones-selector [128F, F]
                ohlo = (
                    lo[:, l : l + 1]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (C * nt, LANE), 1
                    )
                ).astype(jnp.bfloat16)
                ohlo2 = jnp.concatenate([ohlo] * F, axis=1)
                m = (g.astype(jnp.bfloat16) * ohlo2)
                sel = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                jnp.full((LANE, 1), 1.0 if ff == f else 0.0,
                                         jnp.bfloat16)
                                for ff in range(F)
                            ],
                            axis=1,
                        )
                        for f in range(F)
                    ],
                    axis=0,
                )  # [128F, F]
                r = jnp.dot(m, sel, preferred_element_type=jnp.float32)
                for f in range(F):
                    cols[f].append(r[:, f : f + 1])

        picked = jnp.concatenate(sum(cols, []), axis=1)
        if cw is not None:
            cwf = jnp.concatenate([cw] * F, axis=1) if F > 1 else cw
            picked = picked * cwf
        y_ref[:] = picked.reshape(C, nt, F * L).sum(axis=0).astype(y_ref.dtype)

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
    try:
        t0 = time.time()
        y = jf(table_packed, x)
        jax.block_until_ready(y)
        tc_ = time.time() - t0
        t0 = time.time()
        for _ in range(20):
            y = jf(table_packed, x)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / 20
        print(f"{mode:12s}: {dt*1e3:7.2f} ms  (compile {tc_:.0f}s)", flush=True)
        return y
    except Exception as e:
        print(f"{mode:12s}: FAIL {str(e)[:100]}", flush=True)
        return None


def main():
    cfg = tc.load_config("/root/repo/data/config_hash.json")
    model = tc.create_from_config(2, 3, cfg)
    enc = model.network.encoding
    plan = dataclasses.replace(gk.plan_for(enc), batch_tile=NT)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.uniform(-1, 1, enc.n_params), jnp.float32)
    table_packed = jax.jit(lambda p: gk.repack_table(plan, p))(params)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    ys = {}
    for mode in ["gather", "mulreduce", "matreduce"]:
        ys[mode] = run(mode, plan, table_packed, x)
    ref = ys["gather"]
    for mode in ["mulreduce", "matreduce"]:
        if ys[mode] is not None:
            err = np.abs(
                np.asarray(ys[mode], np.float32) - np.asarray(ref, np.float32)
            ).max()
            print(f"{mode} vs gather max err {err}")


if __name__ == "__main__":
    main()
