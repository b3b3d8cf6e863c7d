"""Probe narrow Mosaic capabilities that decide the binned-kernel layout.

Questions (each probed independently, failures caught):
  1. in-kernel jnp.transpose of 2D f32/i32 tiles ([1,N]<->[N,1], [A,B]->[B,A])
  2. in-kernel reshape [N*128, 1] <-> [N, 128]; [24576, 2] -> [512, 96]
  3. grid-step overhead for ~1280-step grids with small blocks
  4. XLA transpose throughput at slab sizes ([512, 1280, 48] f32)
  5. dynamic sublane slice ref[pl.ds(i*256, 256), :] in a fori_loop
  6. triangular-matmul rank computation (bf16 exactness to 256)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tryk(name, fn):
    try:
        out = fn()
        print(f"[OK]   {name}: {out}")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def run_kernel(body, out_shape, *args):
    return pl.pallas_call(body, out_shape=out_shape)(*args)


# 1a transpose [256, 48] -> [48, 256] f32
def t_2d(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:])

tryk("transpose [256,48]->[48,256] f32", lambda: run_kernel(
    t_2d, jax.ShapeDtypeStruct((48, 256), jnp.float32),
    jnp.arange(256 * 48, dtype=jnp.float32).reshape(256, 48)).sum())

tryk("transpose [1,2048]->[2048,1] f32", lambda: run_kernel(
    t_2d, jax.ShapeDtypeStruct((2048, 1), jnp.float32),
    jnp.arange(2048, dtype=jnp.float32).reshape(1, 2048)).sum())

tryk("transpose [1,2048]->[2048,1] i32", lambda: run_kernel(
    t_2d, jax.ShapeDtypeStruct((2048, 1), jnp.int32),
    jnp.arange(2048, dtype=jnp.int32).reshape(1, 2048)).sum())

tryk("transpose [512,128]->[128,512] i32", lambda: run_kernel(
    t_2d, jax.ShapeDtypeStruct((128, 512), jnp.int32),
    jnp.arange(512 * 128, dtype=jnp.int32).reshape(512, 128)).sum())


# 2 reshapes
def r_kernel(shape_out):
    def body(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(shape_out)
    return body

tryk("reshape [192,128]->[24576,1]", lambda: run_kernel(
    r_kernel((24576, 1)), jax.ShapeDtypeStruct((24576, 1), jnp.float32),
    jnp.arange(192 * 128, dtype=jnp.float32).reshape(192, 128)).sum())

tryk("reshape [24576,1]->[192,128]", lambda: run_kernel(
    r_kernel((192, 128)), jax.ShapeDtypeStruct((192, 128), jnp.float32),
    jnp.arange(192 * 128, dtype=jnp.float32).reshape(24576, 1)).sum())

tryk("reshape [24576,2]->[512,96]", lambda: run_kernel(
    r_kernel((512, 96)), jax.ShapeDtypeStruct((512, 96), jnp.float32),
    jnp.arange(24576 * 2, dtype=jnp.float32).reshape(24576, 2)).sum())

tryk("reshape [4096,48]->[4096*48,1]", lambda: run_kernel(
    r_kernel((4096 * 48, 1)), jax.ShapeDtypeStruct((4096 * 48, 1), jnp.float32),
    jnp.arange(4096 * 48, dtype=jnp.float32).reshape(4096, 48)).sum())


# 3 grid-step overhead: 1280 steps, each a [2048,1]-block onehot matmul
def g_body(lo_ref, tbl_ref, o_ref):
    lo = lo_ref[:]  # [2048, 1] i32
    hi5 = lo >> 7
    oh = (hi5 == jax.lax.broadcasted_iota(jnp.int32, (2048, 32), 1)).astype(
        jnp.bfloat16
    )
    o_ref[:] = jnp.dot(
        oh, tbl_ref[:], preferred_element_type=jnp.float32
    )


def probe_grid_overhead():
    n_steps = 1280
    lo = jnp.asarray(
        np.random.default_rng(0).integers(0, 4096, (n_steps * 2048, 1)),
        jnp.int32,
    )
    tbl = jnp.asarray(np.random.default_rng(1).normal(size=(32, 256)), jnp.bfloat16)
    f = pl.pallas_call(
        g_body,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((2048, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 256), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2048, 256), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps * 2048, 256), jnp.float32),
    )
    fj = jax.jit(lambda a, b: f(a, b).sum())
    fj(lo, tbl).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        r = fj(lo, tbl)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    return f"{dt*1e3:.2f} ms for 1280 steps ({dt/1280*1e6:.2f} us/step)"

tryk("grid overhead 1280x[2048,1]-block", probe_grid_overhead)


# 4 XLA transpose throughput at slab size
def probe_xla_transpose():
    a = jnp.asarray(
        np.random.default_rng(0).normal(size=(512, 1280, 48)), jnp.float32
    )
    f = jax.jit(lambda x: jnp.swapaxes(x, 0, 1).reshape(1280, 512 * 48) + 0.0)
    f(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(a)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    return f"{dt*1e3:.2f} ms for 126MB transpose ({126e6*2/dt/1e9:.0f} GB/s)"

tryk("XLA transpose [512,1280,48]", probe_xla_transpose)


# 5 dynamic sublane slice in fori_loop
def d_body(x_ref, o_ref):
    def step(i, acc):
        chunk = x_ref[pl.ds(i * 256, 256), :]  # [256, 128]
        return acc + jnp.sum(chunk, axis=0, keepdims=True)

    o_ref[:] = jax.lax.fori_loop(0, 8, step, jnp.zeros((1, 128), jnp.float32))

tryk("dyn sublane slice fori_loop", lambda: run_kernel(
    d_body, jax.ShapeDtypeStruct((1, 128), jnp.float32),
    jnp.ones((2048, 128), jnp.float32)).sum())


# 6 triangular rank matmul exactness (bf16, counts to 256)
def rank_body(k_ref, o_ref):
    k = k_ref[:]  # [256, 1] i32 keys in [0, 128)
    oh = (k == jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)).astype(
        jnp.bfloat16
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    tri = (col < row).astype(jnp.bfloat16)  # strictly-lower
    ranks = jnp.dot(tri, oh, preferred_element_type=jnp.float32)  # [256,128]
    # extract own-key rank: mask + lane reduce
    o_ref[:] = jnp.sum(ranks * oh.astype(jnp.float32), axis=1, keepdims=True)


def probe_rank():
    keys = np.random.default_rng(0).integers(0, 128, (256, 1)).astype(np.int32)
    got = np.asarray(
        run_kernel(rank_body, jax.ShapeDtypeStruct((256, 1), jnp.float32),
                   jnp.asarray(keys))
    )[:, 0]
    want = np.zeros(256)
    seen = {}
    for i, k in enumerate(keys[:, 0]):
        want[i] = seen.get(int(k), 0)
        seen[int(k)] = seen.get(int(k), 0) + 1
    ok = np.array_equal(got, want)
    return f"exact={ok} max_rank={want.max()}"

tryk("tri-matmul rank (worst-case all-equal)", probe_rank)


def probe_rank_allsame():
    keys = np.full((256, 1), 7, np.int32)
    got = np.asarray(
        run_kernel(rank_body, jax.ShapeDtypeStruct((256, 1), jnp.float32),
                   jnp.asarray(keys))
    )[:, 0]
    ok = np.array_equal(got, np.arange(256.0))
    return f"exact={ok} (ranks 0..255 in bf16 matmul)"

tryk("tri-matmul rank all-same-key", probe_rank_allsame)

print("done")
