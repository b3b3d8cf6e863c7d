"""PPNG1/2/3 parity tests.

Reference semantics re-derived from ppng_1.h / ppng_2.h / ppng_3.h /
interp.h. Each encoding is checked against an independently written
scalar numpy oracle that follows the CUDA kernels' loop structure
(per-sample, per-frequency, per-phase), plus shape/param-count contracts,
autodiff gradients vs finite differences, and factory dispatch rules.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.ops.encodings.ppng import (
    PPNG1Encoding,
    PPNG2Encoding,
    PPNG3Encoding,
)
from tcnn_tpu.registry import create_encoding

F32 = jnp.float32


def _sc(x, F, lo, hi, Q):
    """Per-sample quantized coords: returns (p0, p1, w) arrays [F, 2, D]."""
    D = len(x)
    p0 = np.zeros((F, 2, D), np.int64)
    p1 = np.zeros((F, 2, D), np.int64)
    w = np.zeros((F, 2, D), np.float64)
    for f in range(F):
        base = f * (hi - lo) / (F - 1) + lo if F > 1 else lo
        freq = 2.0**base * 3.1415926535
        for s in range(2):
            for i in range(D):
                sc = math.sin(freq * (x[i] - 0.5) + s * math.pi / 2)
                p = (sc + 1) * 0.5 * (Q - 1)
                a = min(max(math.floor(p), 0), Q - 1)
                b = max(min(math.ceil(p), Q - 1), 0)
                p0[f, s, i] = a
                p1[f, s, i] = b
                w[f, s, i] = p - a
    return p0, p1, w


def _oracle_ppng1(tbl, x, Q, lo, hi):
    """tbl [F,2,D,C,Q,R]; x [D] -> out [F*2*C]."""
    F, _, D, C, _, R = tbl.shape
    p0, p1, w = _sc(x, F, lo, hi, Q)
    out = np.zeros((F, 2, C))
    for f in range(F):
        for s in range(2):
            for c in range(C):
                fs = 0.0
                for r in range(R):
                    prod = 1.0
                    for i in range(D):
                        f0 = tbl[f, s, i, c, p0[f, s, i], r]
                        f1 = tbl[f, s, i, c, p1[f, s, i], r]
                        wi = w[f, s, i]
                        prod *= wi * f1 + (1 - wi) * f0
                    fs += prod
                out[f, s, c] = fs
    return out.reshape(-1)


def _oracle_ppng2(tbl, x, Q, lo, hi):
    """tbl [F,2,3,C,Q,Q,R]; x [3] -> out [F*2*C]."""
    F, _, _, C, _, _, R = tbl.shape
    p0, p1, w = _sc(x, F, lo, hi, Q)
    out = np.zeros((F, 2, C))
    for f in range(F):
        for s in range(2):
            pp = [(p0[f, s, i], p1[f, s, i]) for i in range(3)]
            ww = w[f, s]
            for c in range(C):
                fs = 0.0
                for r in range(R):
                    for a in (0, 1):
                        for b in (0, 1):
                            for z in (0, 1):
                                wt = (
                                    (ww[0] if a else 1 - ww[0])
                                    * (ww[1] if b else 1 - ww[1])
                                    * (ww[2] if z else 1 - ww[2])
                                )
                                fx = tbl[f, s, 0, c, pp[2][z], pp[1][b], r]
                                fy = tbl[f, s, 1, c, pp[2][z], pp[0][a], r]
                                fz = tbl[f, s, 2, c, pp[1][b], pp[0][a], r]
                                fs += wt * fx * fy * fz
                out[f, s, c] = fs
    return out.reshape(-1)


def _oracle_ppng3(flat, x, Q, lo, hi, C):
    """flat [F,2,Q^D*C]; x [D] -> out [F*2*C]. Flat index sum_i p_i Q^i."""
    F = flat.shape[0]
    D = len(x)
    p0, p1, w = _sc(x, F, lo, hi, Q)
    out = np.zeros((F, 2, C))
    for f in range(F):
        for s in range(2):
            for corner in range(1 << D):
                offset = 0
                weight = 1.0
                for i in range(D):
                    inv_i = D - i - 1
                    bit = (corner >> inv_i) & 1
                    pi = p1[f, s, i] if bit else p0[f, s, i]
                    offset += pi * Q**i
                    weight *= w[f, s, i] if bit else 1 - w[f, s, i]
                for c in range(C):
                    out[f, s, c] += flat[f, s, offset * C + c] * weight
    return out.reshape(-1)


@pytest.mark.parametrize("rank", [2, 4])
def test_ppng1_matches_oracle(rank):
    enc = PPNG1Encoding(3, n_quants=9, n_frequencies=3, n_features=2, rank=rank)
    rng = np.random.default_rng(0)
    params = rng.uniform(-0.7, 0.7, enc.n_params).astype(np.float32)
    x = rng.uniform(0, 1, (5, 3)).astype(np.float32)
    y = np.asarray(enc.apply(jnp.asarray(params), jnp.asarray(x), compute_dtype=F32))
    tbl = params.reshape(3, 2, 3, 2, 9, rank)
    for b in range(5):
        exp = _oracle_ppng1(tbl, x[b], 9, 0, 6)
        np.testing.assert_allclose(y[b], exp, rtol=1e-4, atol=1e-5)


def test_ppng2_matches_oracle():
    enc = PPNG2Encoding(3, n_quants=5, n_frequencies=2, n_features=2, rank=2)
    rng = np.random.default_rng(1)
    params = rng.uniform(-0.7, 0.7, enc.n_params).astype(np.float32)
    x = rng.uniform(0, 1, (4, 3)).astype(np.float32)
    y = np.asarray(enc.apply(jnp.asarray(params), jnp.asarray(x), compute_dtype=F32))
    tbl = params.reshape(2, 2, 3, 2, 5, 5, 2)
    for b in range(4):
        exp = _oracle_ppng2(tbl, x[b], 5, 0, 6)
        np.testing.assert_allclose(y[b], exp, rtol=1e-4, atol=1e-5)


def test_ppng3_matches_oracle():
    enc = PPNG3Encoding(3, n_quants=4, n_frequencies=2, n_features=2)
    rng = np.random.default_rng(2)
    params = rng.uniform(-1.0, 1.0, enc.n_params).astype(np.float32)
    x = rng.uniform(0, 1, (4, 3)).astype(np.float32)
    y = np.asarray(enc.apply(jnp.asarray(params), jnp.asarray(x), compute_dtype=F32))
    flat = params.reshape(2, 2, -1)
    for b in range(4):
        exp = _oracle_ppng3(flat, x[b], 4, 0, 6, 2)
        np.testing.assert_allclose(y[b], exp, rtol=1e-4, atol=1e-5)


def test_param_counts_and_output_width():
    # ppng_1.h:235, ppng_2.h:362, ppng_3.h:492, ppng.h:41
    e1 = PPNG1Encoding(3, n_quants=64, n_frequencies=6, n_features=4, rank=4)
    assert e1.n_params == 6 * 2 * 3 * 4 * 64 * 4
    assert e1.n_output_dims == 6 * 2 * 4
    e2 = PPNG2Encoding(3, n_quants=16, n_frequencies=6, n_features=4, rank=4)
    assert e2.n_params == 6 * 2 * 3 * 4 * 16 * 16 * 4
    e3 = PPNG3Encoding(3, n_quants=8, n_frequencies=6, n_features=4)
    assert e3.n_params == 6 * 2 * 8**3 * 4
    assert e3.n_output_dims == 6 * 2 * 4


def test_init_ranges():
    # PPNG1/2: U(+-0.7) (ppng_1.h:326); PPNG3: U(+-1e-4) (ppng.h:68)
    k = jax.random.PRNGKey(0)
    p1 = PPNG1Encoding(3, n_quants=8, n_frequencies=2).init_params(k)
    assert np.abs(p1).max() <= 0.7 and np.abs(p1).max() > 0.1
    p3 = PPNG3Encoding(3, n_quants=4, n_frequencies=2).init_params(k)
    assert np.abs(p3).max() <= 1e-4


def test_param_gradients_finite_diff():
    enc = PPNG1Encoding(3, n_quants=5, n_frequencies=2, n_features=2, rank=2)
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.uniform(-0.5, 0.5, enc.n_params), F32)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (3, 3)), F32)

    def f(p):
        return jnp.sum(enc.apply(p, x, compute_dtype=F32) ** 2)

    g = np.asarray(jax.grad(f)(params))
    eps = 1e-3
    idxs = rng.choice(enc.n_params, 10, replace=False)
    for i in idxs:
        pp = params.at[i].add(eps)
        pm = params.at[i].add(-eps)
        fd = (float(f(pp)) - float(f(pm))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-4)


def test_input_gradients_finite_diff_ppng3():
    # the reference ships analytic input grads only for PPNG3
    # (ppng_3.h:148-186); autodiff provides them here - check vs FD.
    enc = PPNG3Encoding(3, n_quants=6, n_frequencies=2, n_features=2)
    rng = np.random.default_rng(4)
    params = jnp.asarray(rng.uniform(-0.5, 0.5, enc.n_params), F32)
    x = jnp.asarray([[0.31, 0.47, 0.63]], F32)

    def f(xx):
        return jnp.sum(enc.apply(params, xx, compute_dtype=F32) ** 2)

    g = np.asarray(jax.grad(f)(x))
    eps = 1e-4
    for i in range(3):
        xp = x.at[0, i].add(eps)
        xm = x.at[0, i].add(-eps)
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        np.testing.assert_allclose(g[0, i], fd, rtol=5e-2, atol=1e-3)


def test_second_order_input_grads_exist():
    # grad-of-grad through PPNG3 (the reference's
    # backward_backward_input_impl, ppng_3.h:93-168)
    enc = PPNG3Encoding(3, n_quants=4, n_frequencies=2, n_features=2)
    rng = np.random.default_rng(5)
    params = jnp.asarray(rng.uniform(-0.5, 0.5, enc.n_params), F32)
    x = jnp.asarray([[0.3, 0.5, 0.7]], F32)

    def g(xx):
        def f(xi):
            return jnp.sum(enc.apply(params, xi, compute_dtype=F32) ** 2)

        return jnp.sum(jax.grad(f)(xx) ** 2)

    hg = np.asarray(jax.grad(g)(x))
    assert np.all(np.isfinite(hg))
    assert np.abs(hg).max() > 0


def test_factory_dispatch_and_validation():
    cfg = {"otype": "PPNG1", "n_quants": 8, "n_frequencies": 2}
    enc = create_encoding(3, cfg)
    assert isinstance(enc, PPNG1Encoding)
    assert enc.n_quants == 8 and enc.rank == 4 and enc.n_features == 4

    with pytest.raises(ValueError):
        create_encoding(2, cfg)  # D must be 3 (ppng_1.h:372-377)
    with pytest.raises(ValueError):
        PPNG1Encoding(3, rank=3)
    with pytest.raises(ValueError):
        PPNG1Encoding(3, n_features=3)
    for otype, cls in (("PPNG2", PPNG2Encoding), ("PPNG3", PPNG3Encoding)):
        enc = create_encoding(3, {"otype": otype, "n_quants": 4, "n_frequencies": 2})
        assert isinstance(enc, cls)


def test_hyperparams_echo():
    enc = PPNG2Encoding(3, n_quants=8, n_frequencies=3, n_features=2, rank=2)
    hp = enc.hyperparams()
    assert hp["otype"] == "PPNG2"
    assert hp["n_quants"] == 8
    assert hp["rank"] == 2


def test_padding():
    enc = PPNG1Encoding(3, n_quants=4, n_frequencies=2, n_features=2, rank=2)
    enc.set_alignment(16)
    y = enc.apply(
        jnp.zeros(enc.n_params, F32), jnp.full((2, 3), 0.5), compute_dtype=F32
    )
    assert y.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(y[:, 8:]), 0.0)


def test_ppng2_dense_ext_parity():
    """The TPU dense-ext fast path (ops/pallas/dense_ext_kernel.py via
    PPNG2._apply_dense_ext) matches the einsum path: forward, both
    gradients, and the eikonal-pattern second order (round 5: the einsum
    path measured 8.6 s/step at b=2^17 on v5e; dense-ext runs 64.5 ms)."""
    from jax.experimental.pallas import tpu as pltpu

    enc = PPNG2Encoding(3, n_quants=16, n_frequencies=2, n_features=2,
                        rank=2)
    assert enc._dense_ext_ok()
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(enc.n_params,)) * 0.7, jnp.float32)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (300, 3)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(300, enc.n_output_dims)), jnp.float32)

    def loss(pp, xx, impl):
        return jnp.sum(
            enc.apply_unpadded(pp, xx, compute_dtype=jnp.float32,
                               impl=impl) * ct
        )

    y_ref = enc.apply_unpadded(p, x, compute_dtype=jnp.float32, impl="xla")
    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(p, x, "xla")
    with pltpu.force_tpu_interpret_mode():
        y = enc.apply_unpadded(p, x, compute_dtype=jnp.float32,
                               impl="pallas")
        gp, gx = jax.grad(loss, argnums=(0, 1))(p, x, "pallas")
    assert float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max()) < 5e-3
    for a, b in ((gp, gp_ref), (gx, gx_ref)):
        rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9))
        assert rel < 2e-2, rel

    def eik(impl):
        def f(pp):
            gx_ = jax.grad(
                lambda xx: jnp.sum(
                    enc.apply_unpadded(pp, xx, compute_dtype=jnp.float32,
                                       impl=impl)
                )
            )(x)
            return jnp.sum(gx_ * gx_)

        return f

    ref2 = jax.grad(eik("xla"))(p)
    with pltpu.force_tpu_interpret_mode():
        got2 = jax.grad(eik("pallas"))(p)
    rel = float(jnp.linalg.norm(got2 - ref2) / (jnp.linalg.norm(ref2) + 1e-9))
    assert rel < 3e-2, rel


def test_dense_ext_kernel_exactness():
    """dense_ext_gather returns exact bf16 table entries; its scatter vjp
    is the exact transpose (reference accumulation, bf16-rhs class)."""
    from jax.experimental.pallas import tpu as pltpu

    from tcnn_tpu.ops.pallas import dense_ext_kernel as dk

    NL, T, F, C, B = 3, 256, 16, 4, 700
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(NL * T * F,)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, size=(B, C * NL)), jnp.float32)
    assert dk.supported(NL, T, F)
    with pltpu.force_tpu_interpret_mode():
        y = dk.dense_ext_gather(NL, T, F, C, table, idx)
    t = np.asarray(table).reshape(NL, T, F)
    ix = np.asarray(idx).astype(int).reshape(B, C, NL)
    ref = np.zeros((B, C, NL, F), np.float32)
    for b in range(B):
        for c in range(C):
            for l in range(NL):
                ref[b, c, l] = t[l, ix[b, c, l]]
    ref_bf = np.asarray(jnp.asarray(ref, jnp.bfloat16), np.float32)
    assert np.array_equal(np.asarray(y, np.float32),
                          ref_bf.reshape(B, C * NL * F))

    ct = jnp.asarray(rng.normal(size=(B, C * NL * F)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda t_: jnp.sum(
                dk.dense_ext_gather(NL, T, F, C, t_, idx).astype(
                    jnp.float32) * ct
            )
        )(table)
    gr = np.zeros((NL, T, F), np.float32)
    ct_ = np.asarray(ct).reshape(B, C, NL, F)
    for b in range(B):
        for c in range(C):
            for l in range(NL):
                gr[l, ix[b, c, l]] += ct_[b, c, l]
    rel = np.abs(np.asarray(g) - gr.reshape(-1)).max() / np.abs(gr).max()
    assert rel < 2e-2, rel


def test_ppng2_big_batch_remat():
    """b > _CHUNK runs the rematerialized chunked einsum path (the lax.map
    residual stacking OOMed HBM at b=2^17 before round 5) and matches the
    single-chunk math, gradients included."""
    enc = PPNG2Encoding(3, n_quants=8, n_frequencies=1, n_features=2,
                        rank=2)
    old = PPNG2Encoding._CHUNK
    try:
        PPNG2Encoding._CHUNK = 64
        rng = np.random.default_rng(1)
        p = jnp.asarray(rng.normal(size=(enc.n_params,)), jnp.float32)
        x = jnp.asarray(rng.uniform(0.02, 0.98, (200, 3)), jnp.float32)

        def s(pp):
            return jnp.sum(
                enc.apply_unpadded(pp, x, compute_dtype=jnp.float32,
                                   impl="xla")
            )

        chunked, gchunked = jax.value_and_grad(s)(p)
    finally:
        PPNG2Encoding._CHUNK = old
    whole, gwhole = jax.value_and_grad(s)(p)
    np.testing.assert_allclose(float(chunked), float(whole), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gchunked), np.asarray(gwhole),
                               rtol=1e-4, atol=1e-6)
