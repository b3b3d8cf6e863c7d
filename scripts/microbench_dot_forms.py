"""Mosaic dot_general contraction-form cost on the vt kernel's shapes.

The vt scatter uses dims ((1,),(1,)) (contract lanes of both operands);
the gather uses ((0,),(0,)). If Mosaic lowers one form with extra
relayouts, the fix is to restructure operands, not the algorithm."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_maker(dims, swap=False):
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros_like(o_ref)
        a, b = a_ref[:], b_ref[:]
        if swap:
            a, b = b, a
        for _ in range(16):  # 16 levels' worth
            acc = acc + jax.lax.dot_general(
                a, b, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = acc

    return kern


def run(name, a_shape, b_shape, o_shape, dims, swap=False, iters=30):
    a = jnp.asarray(np.random.default_rng(0).standard_normal(a_shape),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(b_shape),
                    jnp.bfloat16)
    f = pl.pallas_call(
        kernel_maker(dims, swap),
        grid=(256,),
        in_specs=[
            pl.BlockSpec(a_shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(o_shape, lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    try:
        o = fj(a, b)
        np.asarray(o).reshape(-1)[:1]
        t0 = time.time()
        for _ in range(iters):
            o = fj(a, b)
        np.asarray(o).reshape(-1)[:1]
        dt = (time.time() - t0) / iters
        # per-invocation = dt / (256 programs * 16 matmuls)
        print(f"{name}: {dt*1e3:.2f} ms for 256x16 matmuls", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    cnt = 2048  # div=2 tile
    h = 256
    # scatter form: oh^T [h, cnt] x rhs^T [256, cnt] contract lanes
    run("scatter ((1,),(1,))", (h, cnt), (256, cnt), (h, 256), ((1,), (1,)))
    # row-major scatter: oh [cnt, h] x rhs [cnt, 256] contract rows
    run("scatter ((0,),(0,))", (cnt, h), (cnt, 256), (h, 256), ((0,), (0,)))
    # gather form (known fast): tbl [h, 256] x ohT [h, cnt]
    run("gather ((0,),(0,))", (h, 256), (h, cnt), (256, cnt), ((0,), (0,)))
    # standard form: a [h, cnt] x b [cnt, 256]
    run("standard ((1,),(0,))", (h, cnt), (cnt, 256), (h, 256), ((1,), (0,)))


if __name__ == "__main__":
    main()
