"""Probe which dynamic-gather forms Mosaic supports on this TPU."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(*args)
        jax.block_until_ready(r)
        print(f"OK   {name}: out {r.shape} {r.dtype}")
        return r
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}")
        return None


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    # A: lane gather within rows (known good)
    src = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)

    def k_lane(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    try_kernel("lane_gather_8x128", k_lane,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), src, idx)

    # B: sublane gather axis=0, 8 rows
    def k_sub(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:] % 8, axis=0)

    try_kernel("sublane_gather_8x128", k_sub,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), src, idx)

    # C: sublane gather from 256 rows (multi-vreg along gather dim)
    src256 = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    idx256 = jnp.asarray(rng.integers(0, 256, (8, 128)), jnp.int32)

    def k_sub256(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            s_ref[:], i_ref[:], axis=0
        )

    try_kernel("sublane_gather_256rows_to_8x128", k_sub256,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), src256, idx256)

    # D: lane gather on wide array (many vregs along non-gather dim = rows)
    srcw = jnp.asarray(rng.normal(size=(512, 128)), jnp.float32)
    idxw = jnp.asarray(rng.integers(0, 128, (512, 128)), jnp.int32)
    try_kernel("lane_gather_512x128", k_lane,
               jax.ShapeDtypeStruct((512, 128), jnp.float32), srcw, idxw)

    # E: jnp.take flat 1-D table
    tflat = jnp.asarray(rng.normal(size=(16384,)), jnp.float32)
    idxf = jnp.asarray(rng.integers(0, 16384, (8, 128)), jnp.int32)

    def k_take(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(s_ref[:], i_ref[:], axis=0)

    try_kernel("take_flat_16k", k_take,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tflat, idxf)

    # F: bf16 lane gather
    srcb = src.astype(jnp.bfloat16)

    def k_laneb(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    try_kernel("lane_gather_bf16", k_laneb,
               jax.ShapeDtypeStruct((8, 128), jnp.bfloat16), srcb, idx)

    # G: dynamic_slice with traced scalar start (per-block addressing)
    def k_ds(s_ref, i_ref, o_ref):
        start = i_ref[0, 0]
        o_ref[:] = s_ref[pl.ds(start, 8), :]

    try_kernel("dynamic_slice_rowstart", k_ds,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), src256, idx)

    # H: PERF of lane-gather select-loop: gather 1024 samples from [256,128]
    # via per-tile broadcast + lane gather + select (VPU-only), timed.
    S_BLOCKS = 256

    def k_selloop(tbl_ref, hi_ref, lo_ref, o_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        acc = jnp.zeros_like(o_ref)
        for r in range(S_BLOCKS):
            row = tbl_ref[r, :]  # [128]
            row_b = jnp.broadcast_to(row[None, :], lo.shape)
            v = jnp.take_along_axis(row_b, lo, axis=1)
            acc = jnp.where(hi == r, v, acc)
        o_ref[:] = acc

    NT = 1024
    hi = jnp.asarray(rng.integers(0, S_BLOCKS, (NT // 128, 128)), jnp.int32)
    lo = jnp.asarray(rng.integers(0, 128, (NT // 128, 128)), jnp.int32)
    try:
        f = pl.pallas_call(
            k_selloop,
            out_shape=jax.ShapeDtypeStruct((NT // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(f)
        r = jf(src256, hi, lo)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(100):
            r = jf(src256, hi, lo)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 100
        print(f"PERF select_loop 1024 gathers from 32768: {dt*1e6:.1f} us "
              f"-> {NT/dt/1e6:.0f} M gathers/s")
    except Exception as e:
        print("FAIL select_loop:", str(e).split(chr(10))[0][:160])


if __name__ == "__main__":
    main()
