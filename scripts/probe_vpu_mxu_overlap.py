"""Can Mosaic overlap independent VPU work under MXU matmuls?

The round-4 phase ablation of the vt train kernel sums additively
(index 2.0 + masks 2.75 + gather 7.4 + scatter 8.4 ~= full 19.8 ms),
which suggests the VPU phases do NOT hide under the matmul phases even
when data-independent. This probe isolates the question: a kernel that
runs the gather-shaped matmul loop alone, vs the same loop plus an
independent VPU chain shaped like the index-math/mask builds (compares
+ selects + adds over [L, C*nt]-class tiles), vs the VPU chain alone.

If t(mm+vpu) ~= max(t(mm), t(vpu)): Mosaic overlaps, and software-
pipelining the next tile's index math under this tile's matmuls is
worth building. If t(mm+vpu) ~= t(mm)+t(vpu): the units serialize and
the 4.7 ms VPU tail cannot be hidden by scheduling.
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

# gather-loop shape class (config_hash hashed level): K=h=256 rows,
# M=128F=256, N=C*nt=2048, 10 levels
H, M, N, LEVELS = 256, 256, 2048, 10
# VPU work shaped like the mask builds: compare+select over [128, N]
VPU_REPS = 40


def _kern(x_ref, t_ref, o_ref, *, mm, vpu, serial):
    acc = jnp.zeros((M, N), jnp.float32)
    xv = x_ref[:]
    dep = jnp.float32(0.0)
    if mm:
        for l in range(LEVELS):
            acc = acc + jax.lax.dot_general(
                t_ref[l * H : (l + 1) * H, :M], xv[l * H : (l + 1) * H, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if vpu:
        # independent integer compare/select chain (mask-build class)
        base = (
            acc[:1, :].astype(jnp.int32)
            if serial  # force a dependency on the matmuls
            else xv[:1, :].astype(jnp.int32)
        )
        v = jnp.broadcast_to(base, (128, N))
        s = jnp.zeros((128, N), jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, N), 0)
        for r in range(VPU_REPS):
            m = (v + r) % 128 == iota
            s = s + jnp.where(m, jnp.float32(r), 0.0)
        dep = jnp.sum(s)
    o_ref[0, 0] = jnp.sum(acc) + dep


def run(mm, vpu, serial=False):
    kern = functools.partial(_kern, mm=mm, vpu=vpu, serial=serial)
    x = jnp.ones((LEVELS * H, N), jnp.bfloat16)
    t = jnp.ones((LEVELS * H, M), jnp.bfloat16)
    f = jax.jit(
        lambda x, t: pl.pallas_call(
            kern,
            grid=(64,),
            in_specs=[
                pl.BlockSpec((LEVELS * H, N), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LEVELS * H, M), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(x, t)
    )
    o = f(x, t)
    np.asarray(o)
    t0 = time.time()
    for _ in range(20):
        o = f(x, t)
    np.asarray(o)
    return (time.time() - t0) / 20


if __name__ == "__main__":
    t_mm = run(mm=True, vpu=False)
    t_vpu = run(mm=False, vpu=True)
    t_both = run(mm=True, vpu=True)
    t_serial = run(mm=True, vpu=True, serial=True)
    print(f"matmuls only:            {t_mm*1e3:7.2f} ms")
    print(f"vpu only:                {t_vpu*1e3:7.2f} ms")
    print(f"matmuls + independent vpu: {t_both*1e3:5.2f} ms "
          f"(sum {1e3*(t_mm+t_vpu):.2f}, max {1e3*max(t_mm,t_vpu):.2f})")
    print(f"matmuls + dependent vpu:   {t_serial*1e3:5.2f} ms")
    overlap = (t_mm + t_vpu - t_both) / min(t_mm, t_vpu)
    print(f"overlap fraction of the smaller phase: {overlap*100:.0f}%")
