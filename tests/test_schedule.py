"""Persistent fused-kernel schedule store + per-trainer knobs
(ops/pallas/schedule.py; VERDICT r3 item 6: INFER_TILE was a process
global tuned for one model - two models in one process must each gate and
trace at their own knobs, and a bench re-run must find the persisted
winners instead of re-tuning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import tcnn_tpu as tc
from tcnn_tpu.ops.pallas import train_kernel as tk
from tcnn_tpu.ops.pallas.schedule import (
    Schedule,
    load_schedule,
    model_schedule_key,
    save_schedule,
)

CFG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 4,
        "n_features_per_level": 2,
        "log2_hashmap_size": 10,
        "base_resolution": 4,
        "per_level_scale": 1.5,
    },
    "network": {
        "otype": "FullyFusedMLP",
        "n_neurons": 64,
        "n_hidden_layers": 2,
        "activation": "ReLU",
        "output_activation": "None",
    },
}


def _make_model(n_levels=4):
    cfg = {**CFG, "encoding": {**CFG["encoding"], "n_levels": n_levels}}
    return tc.create_from_config(2, 3, cfg)


def test_store_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "tcnn_tpu.ops.pallas.schedule._store_path",
        lambda: str(tmp_path / "schedules.json"),
    )
    tm = _make_model()
    key = model_schedule_key(tm.network)
    assert key is not None and "mlp" in key
    assert load_schedule("TPU v5 lite", key) is None
    sched = Schedule(
        recompute_masks=True, fused_tile_div=2, pick_variant="v3b",
        infer_variant="cwend", infer_tile=1024,
    )
    save_schedule("TPU v5 lite", key, sched)
    assert load_schedule("TPU v5 lite", key) == sched
    # a different device kind or model shape misses
    assert load_schedule("TPU v6e", key) is None
    other = model_schedule_key(_make_model(n_levels=8).network)
    assert other != key
    assert load_schedule("TPU v5 lite", other) is None
    # unknown fields in a store entry (newer writer) are ignored
    import json

    path = tmp_path / "schedules.json"
    store = json.loads(path.read_text())
    store[f"TPU v5 lite|{key}"]["future_knob"] = 7
    path.write_text(json.dumps(store))
    assert load_schedule("TPU v5 lite", key) == sched


def test_store_corrupt_file(tmp_path, monkeypatch):
    path = tmp_path / "schedules.json"
    path.write_text("{not json")
    monkeypatch.setattr(
        "tcnn_tpu.ops.pallas.schedule._store_path", lambda: str(path)
    )
    assert load_schedule("TPU v5 lite", "k") is None
    save_schedule("TPU v5 lite", "k", Schedule())  # recovers, no raise
    assert load_schedule("TPU v5 lite", "k") == Schedule()


def test_non_fused_model_has_no_key():
    cfg = {**CFG, "encoding": {"otype": "Frequency", "n_frequencies": 4}}
    tm = tc.create_from_config(2, 3, cfg)
    assert model_schedule_key(tm.network) is None
    assert load_schedule("TPU v5 lite", None) is None
    save_schedule("TPU v5 lite", None, Schedule())  # no-op, no raise


def test_per_trainer_schedule_isolated():
    """Two trainers in one process: each traces at its own knobs; the
    module globals are restored after every call."""
    tm_a, tm_b = _make_model(), _make_model(n_levels=8)
    tr_a, tr_b = tm_a.trainer, tm_b.trainer
    tr_a.use_fused_train_kernel = True
    tr_b.use_fused_train_kernel = True
    tr_a.schedule = Schedule(pick_variant="v3b", fused_tile_div=2)
    tr_b.schedule = Schedule(pick_variant="cwend", infer_tile=256)

    saved = (tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT,
             tk.INFER_VARIANT, tk.INFER_TILE)
    seen = {}
    orig = tk.fused_train_grads

    def spy(model, loss, params, x, targets, loss_scale, **kw):
        seen[id(model)] = (tk.PICK_VARIANT, tk.FUSED_TILE_DIV, tk.INFER_TILE)
        return orig(model, loss, params, x, targets, loss_scale, **kw)

    tk.fused_train_grads, restore = spy, orig
    try:
        x = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
        t = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
        with pltpu.force_tpu_interpret_mode():
            la = tr_a.training_step(x, t)
            lb = tr_b.training_step(x, t)
            np.asarray(la), np.asarray(lb)
    finally:
        tk.fused_train_grads = restore
    assert seen[id(tm_a.network)] == ("v3b", 2, 0)
    assert seen[id(tm_b.network)] == ("cwend", 4, 256)
    assert (tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT,
            tk.INFER_VARIANT, tk.INFER_TILE) == saved


def test_schedule_in_jit_key():
    """Flipping a trainer's schedule retraces instead of reusing the old
    compiled step (knobs are trace-baked)."""
    tm = _make_model()
    tr = tm.trainer
    x = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
    t = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    tr.training_step(x, t)
    n0 = len(tr._jitted)
    tr.schedule = Schedule(pick_variant="cwend")
    tr.training_step(x, t)
    assert len(tr._jitted) == n0 + 1


def test_infer_variant_resolution():
    tm = _make_model()
    plan = tm.network.encoding._kernel_plan()
    saved = (tk.PICK_VARIANT, tk.INFER_VARIANT)
    try:
        tk.PICK_VARIANT, tk.INFER_VARIANT = "v3b", ""
        assert tk._resolve_variant(plan) == "v3b"
        assert tk._resolve_variant(plan, infer=True) == "v3b"
        tk.INFER_VARIANT = "cwend"
        assert tk._resolve_variant(plan) == "v3b"
        assert tk._resolve_variant(plan, infer=True) == "cwend"
        tk.INFER_VARIANT = "bogus"
        with pytest.raises(ValueError):
            tk._resolve_variant(plan, infer=True)
    finally:
        tk.PICK_VARIANT, tk.INFER_VARIANT = saved


def test_trainer_load_schedule(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "tcnn_tpu.ops.pallas.schedule._store_path",
        lambda: str(tmp_path / "schedules.json"),
    )
    tm = _make_model()
    tr = tm.trainer
    assert tr.load_schedule() is False and tr.schedule is None
    sched = Schedule(pick_variant="cwend", infer_tile=512)
    save_schedule(
        jax.devices()[0].device_kind, model_schedule_key(tm.network), sched
    )
    assert tr.load_schedule() is True
    assert tr.schedule == sched


def test_schedule_numerics_parity():
    """A trainer with an exotic (but valid) schedule computes the same
    step as the default schedule."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (512, 2))
    t = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    tm1, tm2 = _make_model(), _make_model()
    tm1.trainer.use_fused_train_kernel = True
    tm2.trainer.use_fused_train_kernel = True
    tm2.trainer.schedule = Schedule(
        recompute_masks=True, fused_tile_div=1, pick_variant="cwend",
        infer_variant="v3b", infer_tile=256,
    )
    with pltpu.force_tpu_interpret_mode():
        l1 = np.asarray(tm1.trainer.training_step(x, t))
        l2 = np.asarray(tm2.trainer.training_step(x, t))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    p1 = np.asarray(tm1.trainer.params)
    p2 = np.asarray(tm2.trainer.params)
    # the pick variants produce the same sums in exact math, but bf16
    # rounding order differs (base: per-level reduce; cwend/v3b: one wide
    # multiply / MXU accumulation) - tolerance covers that class only
    np.testing.assert_allclose(p1, p2, rtol=1e-3, atol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        o1 = np.asarray(tm1.trainer.inference(x))
        o2 = np.asarray(tm2.trainer.inference(x))
    np.testing.assert_allclose(o1, o2, rtol=1e-3, atol=1e-5)


def test_non_schedule_globals_in_jit_key():
    """Trace-time knobs NOT covered by Schedule (VT_OH, VT_PICK,
    IG_TILE_DIV, ABLATE) must also retrace a live Trainer - flipping one
    with a compiled step cached would otherwise silently keep the stale
    program (round-4 advisor, medium)."""
    tm = _make_model()
    tr = tm.trainer
    x = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
    t = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    tr.training_step(x, t)
    for knob, val in [("VT_OH", "mm"), ("VT_PICK", "mm"),
                      ("IG_TILE_DIV", 8), ("ABLATE", "gather")]:
        saved = getattr(tk, knob)
        n0 = len(tr._jitted)
        try:
            setattr(tk, knob, val)
            tr.training_step(x, t)
        finally:
            setattr(tk, knob, saved)
        assert len(tr._jitted) == n0 + 1, knob
    # and with a per-trainer Schedule set, the globals still key
    tr.schedule = Schedule()
    tr.training_step(x, t)
    n0 = len(tr._jitted)
    saved = tk.IG_TILE_DIV
    try:
        tk.IG_TILE_DIV = 16
        tr.training_step(x, t)
    finally:
        tk.IG_TILE_DIV = saved
    assert len(tr._jitted) == n0 + 1
