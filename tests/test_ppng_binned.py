"""PPNG3 binned fast-path parity tests (interpret mode on CPU).

The fast path routes the dense Q^D frequency tables (ppng_3.h:476-494)
through binned_kernel's externally-indexed (ext_iw) mode: per-pick rows
and interpolation weights are computed in XLA (with the bit premix that
spreads every dim over the superblock key), and the five binned kernels
do the lookup/scatter. Checked against the module's own XLA path, which
test_ppng.py pins to a scalar numpy oracle.

Q=32 (t_rows = 2^15, the smallest power-of-two cube above the binned
floor) keeps interpret mode fast; the default config (Q=64, t_rows=2^18)
runs on the TPU tier (test_tpu_hw.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tcnn_tpu.ops.encodings.ppng import PPNG3Encoding

F32 = jnp.float32


@pytest.fixture(autouse=True)
def _force_binned_routing(monkeypatch):
    """Round 5 routed every config the dense-ext kernel's VMEM budget
    admits (t_rows <= 2^18) away from the binned path; these tests exist
    to cover the BINNED machinery, so pin the routing back."""
    monkeypatch.setattr(PPNG3Encoding, "_DENSE_EXT_MAX_ROWS", 0)


def test_default_routing_prefers_dense_ext():
    """The factory default (Q=64, t_rows=2^18) routes the dense-ext path
    (measured 295 vs 438 ms/step at b=2^17 on v5e); the binned path keeps
    beyond-VMEM tables."""
    enc = PPNG3Encoding(3)
    enc._DENSE_EXT_MAX_ROWS = 1 << 18  # the fixture zeroed the class attr
    assert enc._dense_ext_ok()
    big = PPNG3Encoding(3, n_quants=128)  # 2^21 rows -> over budget
    big._DENSE_EXT_MAX_ROWS = 1 << 22
    assert not big._dense_ext_ok()


def _enc(**kw):
    kw.setdefault("n_quants", 32)
    kw.setdefault("n_frequencies", 2)
    kw.setdefault("n_features", 2)
    return PPNG3Encoding(3, **kw)


def _params(enc, seed=0, scale=1.0):
    # U(+-1e-4) init makes parity diffs vanish under bf16; use O(1) values
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal(enc.n_params).astype(np.float32) * scale
    )


def _x(b, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.02, 0.98, (b, 3)).astype(np.float32))


def test_fast_plan_exists_for_default_config():
    enc = PPNG3Encoding(3)  # Q=64 -> t_rows=2^18
    assert enc._fast_plan() is not None
    # too small a cube -> no plan (stays on XLA)
    assert PPNG3Encoding(3, n_quants=16)._fast_plan() is None


def test_forward_parity():
    enc = _enc()
    p, x = _params(enc), _x(384)
    ref = enc.apply_unpadded(p, x, compute_dtype=F32, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        y = enc.apply_unpadded(p, x, compute_dtype=F32, impl="pallas")
    # bf16 table + f32 combine vs all-f32 XLA
    np.testing.assert_allclose(y, ref, atol=2e-2, rtol=2e-2)


def test_drop_counter_zero_on_uniform_batch():
    enc = _enc()
    with pltpu.force_tpu_interpret_mode():
        assert enc.count_binned_drops(_x(512)) == 0


def test_param_and_input_grads_parity():
    enc = _enc()
    p, x = _params(enc), _x(256)
    gyw = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (256, enc.n_output_dims)
        ).astype(np.float32)
    )

    def loss(impl):
        def f(pp, xx):
            y = enc.apply_unpadded(pp, xx, compute_dtype=F32, impl=impl)
            return jnp.sum(y * gyw)

        return f

    gp_ref, gx_ref = jax.grad(loss("xla"), argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        gp, gx = jax.grad(loss("pallas"), argnums=(0, 1))(p, x)
    # table grads: bf16 placement matmuls
    rel = jnp.linalg.norm(gp - gp_ref) / (jnp.linalg.norm(gp_ref) + 1e-12)
    assert float(rel) < 2e-2, float(rel)
    # input grads flow through the (f32) weight chain outside the kernel
    rel = jnp.linalg.norm(gx - gx_ref) / (jnp.linalg.norm(gx_ref) + 1e-12)
    assert float(rel) < 2e-2, float(rel)


def test_second_order_parity():
    # eikonal-style: d/dparams of sum((dy/dx)^2) exercises the bwd-of-bwd
    # (the reference's grad_grad_helper path, ppng_3.h:84-230)
    enc = _enc(n_frequencies=1, n_features=2)
    p, x = _params(enc, seed=5), _x(256, seed=6)

    def eik(impl):
        def f(pp):
            def point_sum(xx):
                y = enc.apply_unpadded(pp, xx, compute_dtype=F32, impl=impl)
                return jnp.sum(y)

            gx = jax.grad(lambda xx: point_sum(xx))(x)
            return jnp.sum(gx * gx)

        return f

    ref = jax.grad(eik("xla"))(p)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(eik("pallas"))(p)
    rel = jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-12)
    assert float(rel) < 3e-2, float(rel)


def test_premix_is_a_bijection():
    enc = _enc(n_frequencies=1)
    Q, D = enc.n_quants, 3
    t_rows = Q**D
    # premix every natural row index through _pick_iw's arithmetic
    H = Q // 4
    p = np.arange(t_rows)
    coords = [(p // Q**i) % Q for i in range(D)]
    row = np.zeros(t_rows, np.int64)
    for i in range(D):
        hi, lo = coords[i] // 4, coords[i] % 4
        row += hi * (H**i * 4**D) + lo * 4**i
    assert np.unique(row).size == t_rows
    # and the premixed TABLE places natural row r at premixed row[r]
    params = np.arange(t_rows * 2 * enc.n_features, dtype=np.float32)
    mixed = np.asarray(enc._premix_table(jnp.asarray(params)))
    nat = params.reshape(2, t_rows, enc.n_features)
    mix = mixed.reshape(2, t_rows, enc.n_features)
    np.testing.assert_array_equal(mix[:, row, :], nat)


def test_batch_padding():
    enc = _enc()
    p = _params(enc)
    x = _x(100)  # not a multiple of the 256-row tile
    ref = enc.apply_unpadded(p, x, compute_dtype=F32, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        y = enc.apply_unpadded(p, x, compute_dtype=F32, impl="pallas")
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-2, rtol=2e-2)
