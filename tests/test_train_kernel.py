"""Fused training-step kernel parity tests (interpret mode).

fused_train_grads must reproduce the composed path's loss exactly and its
gradients up to bf16 accumulation noise (the table-gradient matmuls round
their scatter values to bf16 - the same precision class as the reference's
__half atomicAdd accumulation, grid.h:214-320)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import tcnn_tpu as tc
from tcnn_tpu.ops.pallas.train_kernel import fused_train_grads, supported


def _model(loss="RelativeL2", out_act="None", tile=256, **enc_kw):
    cfg = {
        "loss": {"otype": loss},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 6,
            "n_features_per_level": 2,
            "log2_hashmap_size": 10,
            "base_resolution": 4,
            "per_level_scale": 1.6,
            **enc_kw,
        },
        "network": {
            "otype": "FullyFusedMLP",
            "n_neurons": 64,
            "n_hidden_layers": 2,
            "output_activation": out_act,
        },
    }
    m = tc.create_from_config(2, 3, cfg)
    plan = m.network.encoding._kernel_plan()
    m.network.encoding._kernel_plan_cache = dataclasses.replace(
        plan, batch_tile=tile
    )
    return m


@pytest.mark.parametrize(
    "loss,out_act",
    [("RelativeL2", "None"), ("L2", "Sigmoid"), ("L1", "None"),
     ("SMAPE", "Exponential")],
)
def test_fused_matches_composed(loss, out_act):
    m = _model(loss, out_act)
    tr = m.trainer
    rng = np.random.default_rng(0)
    B = 600  # NOT a tile multiple: exercises the padded-row masking
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    lv_ref, g_ref = tr.loss_and_grad_fn(
        tr.state["params"], x, t, None, jax.random.PRNGKey(0)
    )
    assert supported(m.network, tr.loss_fn, 0.0)
    with pltpu.force_tpu_interpret_mode():
        lv_f, g_f = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale
        )

    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    gr, gf = np.asarray(g_ref), np.asarray(g_f)
    # vector-norm relative error: the kernel quantizes the table to bf16
    # before interpolating (the XLA path interpolates in f32 and casts the
    # result), so %-level element noise is expected everywhere downstream
    # (the composed path ON TPU carries the same bf16 scatter noise in its
    # standalone grid kernel; this CPU reference is full-f32, hence the
    # loose bound - the convergence test below is the functional gate)
    rel = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-12)
    assert rel < 8e-2, rel


def test_fused_convergence_matches_composed():
    """100 training steps with the fused kernel reach the same loss as the
    composed path (bf16 accumulation noise must not hurt convergence)."""
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32) for _ in range(60)]

    def target(x):
        return jnp.stack(
            [jnp.sin(5 * x[:, 0]) * 0.5 + 0.5, x[:, 1], x[:, 0] * x[:, 1]], -1
        )

    finals = []
    for fused in (False, True):
        m = _model()
        m.trainer.use_fused_train_kernel = fused
        ctx = pltpu.force_tpu_interpret_mode() if fused else _nullctx()
        with ctx:
            for x in xs:
                lv = m.trainer.training_step(x, target(x))
        finals.append(float(lv))
    composed, fused_ = finals
    assert fused_ < composed * 1.3 + 1e-5, finals


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_supported_gating():
    m = _model()
    assert supported(m.network, m.trainer.loss_fn, 0.0)
    assert supported(m.network, m.trainer.loss_fn, 0.5)  # perturbation: in-kernel now
    m2 = tc.create_from_config(
        2,
        3,
        {
            "loss": {"otype": "L2"},
            "optimizer": {"otype": "SGD"},
            "encoding": {"otype": "OneBlob"},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 1},
        },
    )
    assert not supported(m2.network, m2.trainer.loss_fn, 0.0)  # not a grid


def test_fused_forward_matches_composed():
    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(700, 2)), jnp.float32)
    ref = np.asarray(
        m.network.apply(tr.state["params"], x).astype(jnp.float32)
    )
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_forward(m.network, tr.state["params"], x), np.float32
        )
    np.testing.assert_allclose(got, ref, atol=3e-2)


def test_fused_forward_infer_tile_override(monkeypatch):
    """INFER_TILE retiles the forward-only kernel without changing values
    (row padding/trim must stay exact at a non-multiple batch)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(700, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(
            fused_forward(m.network, tr.state["params"], x), np.float32
        )
        monkeypatch.setattr(tk, "INFER_TILE", 512)
        got = np.asarray(
            fused_forward(m.network, tr.state["params"], x), np.float32
        )
    np.testing.assert_array_equal(got, base)


def test_data_parallel_uses_fused_path_shape():
    """DP without pdf routes through the pdf-less step (which permits the
    fused kernel on TPU); on CPU it still must produce correct results."""
    from tcnn_tpu.parallel.data_parallel import DataParallelTrainer, create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    m = _model(tile=128)
    dp = DataParallelTrainer(m.trainer, create_mesh(jax.devices()[:4]))
    state = dp.replicate(m.trainer.state)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(512, 3)), jnp.float32)
    state, l0 = dp.step(state, x, t)
    for _ in range(10):
        state, lv = dp.step(state, x, t)
    assert float(lv) < float(l0)


def test_fused_with_pdf_and_max_level():
    """data_pdf flows into the in-kernel loss; max_level statically skips
    clamped levels (grid.h:69-92 semantics), matching the composed path."""
    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(5)
    B = 512
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    pdf = jnp.asarray(rng.uniform(0.5, 2.0, (B, 3)), jnp.float32)

    m.network.encoding.max_level = 0.5  # clamp upper half of the levels

    lv_ref, g_ref = tr.loss_and_grad_fn(
        tr.state["params"], x, t, pdf, jax.random.PRNGKey(0)
    )
    with pltpu.force_tpu_interpret_mode():
        lv_f, g_f = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale,
            pdf=pdf,
        )
    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    gr, gf = np.asarray(g_ref), np.asarray(g_f)
    rel = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-12)
    assert rel < 8e-2, rel
    # clamped levels must have exactly zero table gradients in both
    n_net = m.network.network.n_params
    enc = m.network.encoding
    F = enc.n_features_per_level
    # max_level*L + 1e-3 = 3.001 -> levels 0..3 active, 4..5 clamped
    for lvl in range(4, 6):
        off = n_net + int(enc._offsets[lvl]) * F
        size = int(enc._sizes[lvl]) * F
        assert np.all(gf[off : off + size] == 0.0)
        assert np.all(gr[off : off + size] == 0.0)


def test_fused_stochastic_scatter():
    """The fused kernel's stochastic path: exact forward/loss, single-corner
    table scatter (integer gradient mass, deterministic)."""
    cfg_enc = {
        "otype": "HashGrid",
        "n_levels": 4,
        "n_features_per_level": 2,
        "log2_hashmap_size": 9,
        "base_resolution": 4,
        "per_level_scale": 1.6,
        "stochastic_interpolation": True,
    }
    m = tc.create_from_config(
        2,
        3,
        {
            "loss": {"otype": "L2"},
            "optimizer": {"otype": "Adam"},
            "encoding": cfg_enc,
            "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                        "n_hidden_layers": 1},
        },
    )
    plan = m.network.encoding._kernel_plan()
    m.network.encoding._kernel_plan_cache = dataclasses.replace(
        plan, batch_tile=256
    )
    tr = m.trainer
    assert supported(m.network, tr.loss_fn, 0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(512, 3)), jnp.float32)

    lv_ref, _ = tr.loss_and_grad_fn(
        tr.state["params"], x, t, None, jax.random.PRNGKey(0)
    )
    with pltpu.force_tpu_interpret_mode():
        lv_f, g1 = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale
        )
        _, g2 = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale
        )
    # the loss/forward is exact regardless of the stochastic scatter
    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # table grads nonzero and finite
    n_net = m.network.network.n_params
    gt = np.asarray(g1[n_net:])
    assert np.isfinite(gt).all() and np.abs(gt).max() > 0


def test_fused_perturbation_matches_composed():
    """perturbation_sigma is now handled in-kernel (noise precomputed with
    the SAME rng as the composed path) - losses and gradients must agree."""
    m = _model()
    tr = m.trainer
    tr.perturbation_sigma = 0.1
    rng = np.random.default_rng(2)
    B = 512
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    key = jax.random.PRNGKey(5)

    assert supported(m.network, tr.loss_fn, tr.perturbation_sigma)
    tr.use_fused_train_kernel = False
    lv_ref, g_ref = tr.loss_and_grad_fn(tr.state["params"], x, t, None, key)
    tr.use_fused_train_kernel = True
    with pltpu.force_tpu_interpret_mode():
        lv_f, g_f = tr.loss_and_grad_fn(tr.state["params"], x, t, None, key)

    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    gr, gf = np.asarray(g_ref), np.asarray(g_f)
    rel = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-12)
    assert rel < 8e-2, rel
    # the noise must actually differ from the unperturbed loss
    tr.use_fused_train_kernel = False
    tr.perturbation_sigma = 0.0
    lv_clean, _ = tr.loss_and_grad_fn(tr.state["params"], x, t, None, key)
    assert abs(float(lv_clean) - float(lv_ref)) > 1e-6


def test_fused_external_dl_doutput_matches_composed():
    """External dL_doutput runs through the fused kernel (raw per-sample
    gradient sums, no loss normalization) and must match the autodiff vjp."""
    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(3)
    B = 600  # not a tile multiple
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    dl = jnp.asarray(
        rng.normal(size=(B, m.network.padded_output_width)) * 1e-2,
        jnp.float32,
    )

    tr.use_fused_train_kernel = False
    g_ref = np.asarray(tr.external_grad_fn(tr.state["params"], x, dl))
    tr.use_fused_train_kernel = True
    assert tr._fused_kernel_ok()
    with pltpu.force_tpu_interpret_mode():
        g_f = np.asarray(tr.external_grad_fn(tr.state["params"], x, dl))

    rel = np.linalg.norm(g_f - g_ref) / max(np.linalg.norm(g_ref), 1e-12)
    assert rel < 8e-2, rel


def test_fused_rng_hash_matches_composed():
    """HashType.Rng through the fused kernel (VERDICT r2 item 5): the
    precomputed PCG32 hashes now feed the megakernel (corner-stacked
    [C, B, L] input), so Rng configs keep fused speed. Parity vs the
    composed/XLA path, which is golden-verified bit-exact for rng_hash."""
    m = _model(hash="Rng")
    tr = m.trainer
    assert m.network.encoding._kernel_plan().ext_hash
    assert supported(m.network, tr.loss_fn, 0.0)
    rng = np.random.default_rng(5)
    B = 600
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    lv_ref, g_ref = tr.loss_and_grad_fn(
        tr.state["params"], x, t, None, jax.random.PRNGKey(0)
    )
    with pltpu.force_tpu_interpret_mode():
        lv_f, g_f = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale
        )
    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    gr, gf = np.asarray(g_ref), np.asarray(g_f)
    rel = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-12)
    assert rel < 8e-2, rel


def test_fused_rng_stochastic_matches_xla():
    """Rng hashing + stochastic single-corner scatter in the fused kernel:
    the chosen corner's precomputed hash is selected from the stacked ext
    rows; gradients must match the XLA stochastic path (same uniforms)."""
    m = _model(hash="Rng", stochastic_interpolation=True)
    tr = m.trainer
    plan = m.network.encoding._kernel_plan()
    assert plan.ext_hash and plan.stochastic
    assert supported(m.network, tr.loss_fn, 0.0)
    rng = np.random.default_rng(6)
    B = 512
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    lv_ref, g_ref = tr.loss_and_grad_fn(
        tr.state["params"], x, t, None, jax.random.PRNGKey(0)
    )
    with pltpu.force_tpu_interpret_mode():
        lv_f, g_f = fused_train_grads(
            m.network, tr.loss_fn, tr.state["params"], x, t, tr.loss_scale
        )
    np.testing.assert_allclose(float(lv_f), float(lv_ref), rtol=1e-3)
    gr, gf = np.asarray(g_ref), np.asarray(g_f)
    rel = np.linalg.norm(gf - gr) / max(np.linalg.norm(gr), 1e-12)
    assert rel < 8e-2, rel


def test_fused_recompute_masks_matches_default(monkeypatch):
    """RECOMPUTE_MASKS=True (masks rebuilt in the scatter instead of cached
    between gather and scatter - the big-tile VMEM mode) must be bit-exact
    with the default mode: the rebuilt one-hots come from the same live
    hi/lo/cw arrays."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    m = _model(tile=512)
    tr = m.trainer
    rng = np.random.default_rng(7)
    B = 700  # NOT a tile multiple
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    outs = {}
    for recompute in (False, True):
        monkeypatch.setattr(tk, "RECOMPUTE_MASKS", recompute)
        with pltpu.force_tpu_interpret_mode():
            outs[recompute] = fused_train_grads(
                m.network, tr.loss_fn, tr.state["params"], x, t,
                tr.loss_scale,
            )
    np.testing.assert_array_equal(
        np.asarray(outs[False][0]), np.asarray(outs[True][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[False][1]), np.asarray(outs[True][1])
    )


def test_fused_recompute_masks_with_max_level(monkeypatch):
    """recompute mode + max_level clamping: only active levels scatter."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    m = _model()
    m.network.encoding.max_level = 0.5
    tr = m.trainer
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(512, 3)), jnp.float32)
    outs = {}
    for recompute in (False, True):
        monkeypatch.setattr(tk, "RECOMPUTE_MASKS", recompute)
        with pltpu.force_tpu_interpret_mode():
            outs[recompute] = fused_train_grads(
                m.network, tr.loss_fn, tr.state["params"], x, t,
                tr.loss_scale,
            )
    np.testing.assert_array_equal(
        np.asarray(outs[False][1]), np.asarray(outs[True][1])
    )


@pytest.mark.parametrize("variant", ["cwend", "v3b", "vt"])
def test_fused_pick_variants_match_base(monkeypatch, variant):
    """PICK_VARIANT formulations (unweighted masks + wide weight multiply;
    v3b additionally reduces lanes via selection matmuls) compute the same
    products and sums as base - loss and gradients must agree to f32
    matmul-reorder noise (the f-major W0 row permutation changes the MXU
    K-accumulation order)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(11)
    B = 700  # NOT a tile multiple
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)

    outs, infs = {}, {}
    for v in ("base", variant):
        monkeypatch.setattr(tk, "PICK_VARIANT", v)
        with pltpu.force_tpu_interpret_mode():
            outs[v] = fused_train_grads(
                m.network, tr.loss_fn, tr.state["params"], x, t,
                tr.loss_scale,
            )
            infs[v] = np.asarray(
                fused_forward(m.network, tr.state["params"], x),
                np.float32,
            )
    np.testing.assert_allclose(
        float(outs[variant][0]), float(outs["base"][0]), rtol=1e-5
    )
    ga = np.asarray(outs["base"][1])
    gb = np.asarray(outs[variant][1])
    rel = np.linalg.norm(gb - ga) / max(np.linalg.norm(ga), 1e-12)
    assert rel < 1e-4, rel
    np.testing.assert_allclose(infs[variant], infs["base"],
                               rtol=2e-2, atol=2e-5)


@pytest.mark.parametrize("variant", ["cwend", "v3b", "vt"])
def test_fused_pick_variants_stochastic_and_max_level(monkeypatch, variant):
    """Variant layouts stay correct through the stochastic single-corner
    scatter (f-major genc slicing) and max_level clamping (inactive levels
    contribute zero encoding columns and zero gradients)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    for enc_kw in ({"stochastic_interpolation": True}, {}):
        m = _model(**enc_kw)
        if not enc_kw:
            m.network.encoding.max_level = 0.5
        tr = m.trainer
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(512, 3)), jnp.float32)
        outs = {}
        for v in ("base", variant):
            monkeypatch.setattr(tk, "PICK_VARIANT", v)
            with pltpu.force_tpu_interpret_mode():
                outs[v] = fused_train_grads(
                    m.network, tr.loss_fn, tr.state["params"], x, t,
                    tr.loss_scale,
                )
        ga, gb = np.asarray(outs["base"][1]), np.asarray(outs[variant][1])
        rel = np.linalg.norm(gb - ga) / max(np.linalg.norm(ga), 1e-12)
        assert rel < 1e-4, (enc_kw, rel)


@pytest.mark.parametrize("lomask", ["bcast", "cache"])
def test_vt_lomask_forms_match_mm(monkeypatch, lomask):
    """VT_LOMASK forms build the SAME lane masks (lo == j, exact integer
    compare in every form), so the vt kernel's loss, gradients, and
    forward must be bit-identical to "mm"."""
    from tcnn_tpu.ops.pallas import train_kernel as tk
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    m = _model()
    tr = m.trainer
    rng = np.random.default_rng(13)
    B = 700  # NOT a tile multiple
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    monkeypatch.setattr(tk, "PICK_VARIANT", "vt")

    outs, infs = {}, {}
    for form in ("mm", lomask):
        monkeypatch.setattr(tk, "VT_LOMASK", form)
        with pltpu.force_tpu_interpret_mode():
            outs[form] = fused_train_grads(
                m.network, tr.loss_fn, tr.state["params"], x, t,
                tr.loss_scale,
            )
            infs[form] = np.asarray(
                fused_forward(m.network, tr.state["params"], x), np.float32
            )
    assert float(outs[lomask][0]) == float(outs["mm"][0])
    np.testing.assert_array_equal(
        np.asarray(outs[lomask][1]), np.asarray(outs["mm"][1])
    )
    np.testing.assert_array_equal(infs[lomask], infs["mm"])


@pytest.mark.parametrize("f", [2, 4])
def test_vt_fl_matches_standard_layout(monkeypatch, f):
    """VT_FL (f-on-lanes packing, lane = (row % LQ)*F + f) selects the
    same table entries through one-hot matmuls in both layouts, so loss,
    gradients, and forward must be BIT-identical to the standard packing
    (the tree reduce only reassociates exact zeros). f=4 exercises
    LQ=32 and the two-stage fold."""
    from tcnn_tpu.ops.pallas import train_kernel as tk
    from tcnn_tpu.ops.pallas.train_kernel import fused_forward

    m = _model(n_features_per_level=f)
    tr = m.trainer
    rng = np.random.default_rng(14)
    B = 700  # NOT a tile multiple
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    monkeypatch.setattr(tk, "PICK_VARIANT", "vt")

    outs, infs = {}, {}
    for fl in (False, True):
        monkeypatch.setattr(tk, "VT_FL", fl)
        assert tk._use_fl(m.network.encoding._kernel_plan()) == fl
        with pltpu.force_tpu_interpret_mode():
            outs[fl] = fused_train_grads(
                m.network, tr.loss_fn, tr.state["params"], x, t,
                tr.loss_scale,
            )
            infs[fl] = np.asarray(
                fused_forward(m.network, tr.state["params"], x), np.float32
            )
    assert float(outs[True][0]) == float(outs[False][0])
    np.testing.assert_array_equal(
        np.asarray(outs[True][1]), np.asarray(outs[False][1])
    )
    np.testing.assert_array_equal(infs[True], infs[False])


def test_infer_gate_rejects_oversized_tile(monkeypatch):
    """supported_infer sizes the forward kernel at the process-global
    INFER_TILE: a tile autotuned for one model must not drag a different
    model onto a VMEM-overflowing fused forward - Trainer.inference falls
    back to the composed path instead (self-review r3 finding)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    m = _model()
    assert tk.supported_infer(m.network)  # default tile fits
    monkeypatch.setattr(tk, "INFER_TILE", 1 << 20)
    assert not tk.supported_infer(m.network)
    # the trainer-level gate agrees (so inference() takes the composed jit)
    monkeypatch.setattr(m.trainer, "use_fused_train_kernel", True)
    assert not m.trainer._fused_infer_ok()


def test_ig_gate_ignores_train_knobs(monkeypatch):
    """supported_ig models the ig kernel's OWN fixed schedule
    (tile batch_tile//4, all masks cached, base pick): flipping the train
    knobs must not change its verdict (self-review r3 finding - the gate
    previously delegated to supported(), whose estimate moves with
    RECOMPUTE_MASKS/FUSED_TILE_DIV/PICK_VARIANT)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    m = _model()
    m.network.encoding.fast_input_grads = True
    base = tk.supported_ig(m.network)
    for knobs in ((True, 2, "v3b"), (False, 8, "cwend")):
        monkeypatch.setattr(tk, "RECOMPUTE_MASKS", knobs[0])
        monkeypatch.setattr(tk, "FUSED_TILE_DIV", knobs[1])
        monkeypatch.setattr(tk, "PICK_VARIANT", knobs[2])
        assert tk.supported_ig(m.network) == base, knobs
