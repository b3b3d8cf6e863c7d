#!/usr/bin/env python
"""Stock-framework comparison benchmark - the TPU analog of the
reference's `benchmarks/image/bench_tensorflow.py` (which trains a
plain-TensorFlow fp16 OneBlob+MLP on the image task to quantify what the
fused kernels buy over a stock framework).

Here the "stock framework" is plain JAX: the OneBlob encoding and the MLP
are written from scratch in jnp (NO tcnn_tpu kernels or modules), bf16
compute with an fp32 master copy, optax.adam, whole step jitted - i.e.
exactly what a competent JAX user would write without this library. The
sweep protocol matches bench_image.py / bench_ours.cu:188-332 (mean
training + inference samples/s, warmup = half the iterations, batch
2^14..2^21), emitting the same JSON row shape so the two files can be
plotted together (the README's fully-fused-vs-stock comparison).

Usage: python benchmarks/bench_stock_jax.py [n_neurons ...] [out.json]
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

# image loading only - not part of the benchmarked model/step
from tcnn_tpu.utils.image import (
    build_quad_table,
    load_image,
    sample_image_quad,
    synthetic_image,
)

REFERENCE_IMAGE = "/root/reference/data/images/albert.jpg"
TARGET_SAMPLES = 1 << 24
N_BINS = 64  # config_oneblob.json / bench_tensorflow.py:248


def one_blob(x, n_bins):
    """Stock-jnp OneBlob: quartic-kernel CDF differences over n_bins
    (the same math bench_tensorflow.py:87-117 writes in stock TF)."""

    def cdf(z):
        # quartic-kernel CDF with radius 1 in z units (z = x * n_bins)
        z2 = z * z
        return jnp.clip(
            0.5 + z * (15.0 / 16.0) * (1.0 - (2.0 / 3.0) * z2 + z2 * z2 / 5.0),
            0.0,
            1.0,
        )

    edges = jnp.arange(n_bins + 1, dtype=jnp.float32) / n_bins  # [n_bins+1]
    z = (edges[None, None, :] - x[:, :, None]) * n_bins
    # wraparound: the +/-1-in-x shifted kernel evaluations
    c = cdf(z) + cdf(z - n_bins) + cdf(z + n_bins)
    feats = c[:, :, 1:] - c[:, :, :-1]
    return feats.reshape(x.shape[0], -1)


def hash_grid(tables, x, base=16, scale=1.5):
    """Stock-jnp multiresolution hash grid (config_hash shape): what a
    competent JAX user writes without this library - corner index math,
    coherent-prime hashing, jnp.take gathers (XLA lowers the gradient to
    scatter-add). tables: [L, T, F]."""
    n_levels, t_rows, _ = tables.shape
    outs = []
    for lvl in range(n_levels):
        res = int(np.ceil(base * scale**lvl - 1.0)) + 1
        pos = x * (res - 1)
        p0 = jnp.floor(pos)
        w = pos - p0
        p0 = p0.astype(jnp.uint32)
        feats = 0.0
        for c in range(4):
            dx, dy = c & 1, c >> 1
            cx = p0[:, 0] + dx
            cy = p0[:, 1] + dy
            if res * res <= t_rows:  # dense levels: row-major index
                idx = cy * res + cx
            else:  # hashed levels: coherent-prime xor hash
                idx = cx ^ (cy * jnp.uint32(2654435761))
            idx = (idx % t_rows).astype(jnp.int32)
            wgt = jnp.where(dx, w[:, 0], 1 - w[:, 0]) * jnp.where(
                dy, w[:, 1], 1 - w[:, 1]
            )
            feats = feats + jnp.take(tables[lvl], idx, axis=0) * wgt[:, None]
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)


def init_mlp(key, n_in, width, n_hidden, n_out):
    sizes = [n_in] + [width] * n_hidden + [n_out]
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        lim = math.sqrt(6.0 / (a + b))
        params.append(
            {
                "w": jax.random.uniform(k, (a, b), jnp.float32, -lim, lim),
            }
        )
    return params


def mlp_apply(params, h):
    h = h.astype(jnp.bfloat16)
    for i, layer in enumerate(params):
        h = h @ layer["w"].astype(jnp.bfloat16)
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)


def bench_width(image, width, n_hidden, batch_sizes):
    h, w = image.shape[:2]
    quad = jax.jit(build_quad_table)(jnp.asarray(image))
    rows = []
    for bs in batch_sizes:
        params = init_mlp(jax.random.PRNGKey(1337), 2 * N_BINS, width,
                          n_hidden, 3)
        # config_oneblob.json optimizer hyperparams
        opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-8)
        opt_state = opt.init(params)

        def loss_fn(p, xy, rgb):
            pred = mlp_apply(p, one_blob(xy, N_BINS))
            # relative L2, like the reference configs
            return jnp.mean((pred - rgb) ** 2 / (pred**2 + 1e-2))

        def step(carry, quad_arg):
            # quad is a jit ARGUMENT: a closed-over 48 MB constant
            # overflows the axon compile request (same note in bench.py)
            p, s, key = carry
            key, k = jax.random.split(key)
            xy = jax.random.uniform(k, (bs, 2))
            rgb = sample_image_quad(quad_arg, h, w, xy)
            loss, grads = jax.value_and_grad(loss_fn)(p, xy, rgb)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, key), loss

        _jstep = jax.jit(step, donate_argnums=(0,))
        jstep = lambda c: _jstep(c, quad)

        def infer(p, key):
            key, k = jax.random.split(key)
            xy = jax.random.uniform(k, (bs, 2))
            return key, mlp_apply(p, one_blob(xy, N_BINS))

        jinfer = jax.jit(infer)

        n_iters = max(TARGET_SAMPLES // bs, 8)
        warmup = n_iters // 2

        # NOTE: sync via a tiny dependent D2H copy, NOT block_until_ready -
        # the latter silently no-ops over the axon tunnel (PERF.md round-2
        # timing-methodology note).
        carry = (params, opt_state, jax.random.PRNGKey(7))
        carry, loss = jstep(carry)
        float(loss)
        for _ in range(warmup - 1):
            carry, loss = jstep(carry)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            carry, loss = jstep(carry)
        float(loss)
        train_tp = n_iters * bs / (time.perf_counter() - t0)

        p_final = carry[0]
        key, out = jinfer(p_final, carry[2])
        np.asarray(out[0, :1])
        for _ in range(warmup - 1):
            key, out = jinfer(p_final, key)
        np.asarray(out[0, :1])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            key, out = jinfer(p_final, key)
        np.asarray(out[0, :1])
        infer_tp = n_iters * bs / (time.perf_counter() - t0)

        row = {
            "platform": "stock_jax",
            "device": jax.devices()[0].device_kind,
            "otype": "jnp-MLP",
            "n_neurons": width,
            "n_hidden_layers": n_hidden,
            "batch_size": bs,
            "training_throughput": round(train_tp, 1),
            "inference_throughput": round(infer_tp, 1),
            "final_loss": float(loss),
        }
        rows.append(row)
        sys.stderr.write(
            f"# width {width} bs=2^{int(np.log2(bs))}: "
            f"train {train_tp/1e6:.2f} M/s, infer {infer_tp/1e6:.2f} M/s\n"
        )
    return rows


def bench_hashgrid(image, batch_sizes):
    """config_hash in stock jnp (HashGrid L16/F2/T=2^15/base16/s1.5 +
    MLP 64x2) - the direct comparison against bench.py's fused-kernel
    headline. Iterations are capped: the XLA gather/scatter path runs
    ~2 orders slower than the fused kernel."""
    h, w = image.shape[:2]
    quad = jax.jit(build_quad_table)(jnp.asarray(image))
    n_levels, n_feats, log2_t = 16, 2, 15
    rows = []
    for bs in batch_sizes:
        key = jax.random.PRNGKey(1337)
        key, k1, k2 = jax.random.split(key, 3)
        tables = jax.random.uniform(
            k1, (n_levels, 1 << log2_t, n_feats), jnp.float32, -1e-4, 1e-4
        )
        mlp = init_mlp(k2, n_levels * n_feats, 64, 2, 3)
        params = {"tables": tables, "mlp": mlp}
        opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
        opt_state = opt.init(params)

        def loss_fn(p, xy, rgb):
            pred = mlp_apply(p["mlp"], hash_grid(p["tables"], xy))
            return jnp.mean((pred - rgb) ** 2 / (pred**2 + 1e-2))

        def step(carry, quad_arg):
            p, s, key = carry
            key, k = jax.random.split(key)
            xy = jax.random.uniform(k, (bs, 2))
            rgb = sample_image_quad(quad_arg, h, w, xy)
            loss, grads = jax.value_and_grad(loss_fn)(p, xy, rgb)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, key), loss

        _jstep = jax.jit(step, donate_argnums=(0,))
        jstep = lambda c: _jstep(c, quad)

        def infer(p, key):
            key, k = jax.random.split(key)
            xy = jax.random.uniform(k, (bs, 2))
            return key, mlp_apply(p["mlp"], hash_grid(p["tables"], xy))

        jinfer = jax.jit(infer)

        n_iters = min(max(TARGET_SAMPLES // bs, 8), 48)
        warmup = max(n_iters // 4, 2)

        carry = (params, opt_state, key)
        carry, loss = jstep(carry)
        float(loss)
        for _ in range(warmup - 1):
            carry, loss = jstep(carry)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            carry, loss = jstep(carry)
        float(loss)
        train_tp = n_iters * bs / (time.perf_counter() - t0)

        p_final = carry[0]
        key, out = jinfer(p_final, carry[2])
        np.asarray(out[0, :1])
        for _ in range(warmup - 1):
            key, out = jinfer(p_final, key)
        np.asarray(out[0, :1])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            key, out = jinfer(p_final, key)
        np.asarray(out[0, :1])
        infer_tp = n_iters * bs / (time.perf_counter() - t0)

        row = {
            "platform": "stock_jax",
            "device": jax.devices()[0].device_kind,
            "otype": "jnp-HashGrid+MLP",
            "n_neurons": 64,
            "n_hidden_layers": 2,
            "batch_size": bs,
            "training_throughput": round(train_tp, 1),
            "inference_throughput": round(infer_tp, 1),
            "final_loss": float(loss),
        }
        rows.append(row)
        sys.stderr.write(
            f"# hashgrid bs=2^{int(np.log2(bs))}: "
            f"train {train_tp/1e6:.2f} M/s, infer {infer_tp/1e6:.2f} M/s\n"
        )
    return rows


def main():
    widths = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64, 128]
    out_path = next(
        (a for a in sys.argv[1:] if not a.isdigit() and a != "nohash"),
        "bench_result_stock_jax.json",
    )
    image = (
        load_image(REFERENCE_IMAGE)
        if os.path.exists(REFERENCE_IMAGE)
        else synthetic_image(1024, 1024)
    )
    batch_sizes = [1 << e for e in range(14, 22)]
    # 4 hidden layers for width 128, 2 for width 64 (config_oneblob vs
    # config_hash network shapes; bench_tensorflow sweeps the same pair)
    all_rows = []
    for width in widths:
        n_hidden = 5 if width >= 128 else 2
        all_rows += bench_width(image, width, n_hidden, batch_sizes)
    if "nohash" not in sys.argv:
        all_rows += bench_hashgrid(image, [1 << e for e in range(14, 19)])
    with open(out_path, "w") as f:
        json.dump({"stock_jax": all_rows}, f, indent=1)
    print(json.dumps({"wrote": out_path, "rows": len(all_rows)}))


if __name__ == "__main__":
    main()
