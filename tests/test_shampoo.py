"""Shampoo optimizer tests (vs shampoo.h semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.optimizers.shampoo import (
    ShampooOptimizer,
    _debiased_alpha_beta,
    inverse_fourth_root,
)
from tcnn_tpu.registry import create_optimizer


def test_inverse_fourth_root():
    rng = np.random.default_rng(0)
    for m in (4, 16, 64):
        q, _ = np.linalg.qr(rng.normal(size=(m, m)))
        ev = rng.uniform(0.1, 5.0, m)
        a = (q * ev) @ q.T
        a = 0.5 * (a + a.T)
        x = np.asarray(inverse_fourth_root(jnp.asarray(a[None], jnp.float32)))[0]
        # x should satisfy x^4 @ a ~= I
        x4 = x @ x @ x @ x
        np.testing.assert_allclose(x4 @ a, np.eye(m), atol=5e-3)


def test_debiased_alpha_beta_matches_reference():
    # shampoo.h:311-321 at several step values
    for decay in (0.9, 0.99):
        for t in (0, 1, 5, 100):
            a, b = _debiased_alpha_beta(decay, jnp.asarray(t, jnp.uint32))
            debias = 1 - decay ** (t + 1)
            np.testing.assert_allclose(float(a), (1 - decay) / debias, rtol=1e-4)
            np.testing.assert_allclose(
                float(b), decay * (1 - decay**t) / debias, rtol=1e-4, atol=1e-7
            )


def _make(n_extra=16, **kw):
    opt = ShampooOptimizer(learning_rate=1e-2, **kw)
    layer_sizes = [(8, 4), (8, 8), (8, 8), (4, 8)]
    n_mat = sum(r * c for r, c in layer_sizes)
    opt.allocate(n_mat + n_extra, layer_sizes)
    return opt, n_mat + n_extra


def test_first_step_only_updates_remaining():
    # shampoo.h:765-768: matrix weights untouched on the very first step;
    # non-matrix weights take the momentum step every step.
    opt, n = _make()
    state = opt.init_state()
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=n), jnp.float32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    state, w1 = opt.step(state, 1.0, w, g)
    n_mat = opt.n_matrix_weights
    np.testing.assert_array_equal(np.asarray(w1[:n_mat]), np.asarray(w[:n_mat]))
    assert not np.allclose(np.asarray(w1[n_mat:]), np.asarray(w[n_mat:]))
    # second step must move matrix weights
    state, w2 = opt.step(state, 1.0, w1, g)
    assert not np.allclose(np.asarray(w2[:n_mat]), np.asarray(w1[:n_mat]))


def test_loss_scale_invariance():
    opt, n = _make()
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=n), jnp.float32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)

    s1 = opt.init_state()
    s2 = opt.init_state()
    for _ in range(3):
        s1, w1 = opt.step(s1, 1.0, w, g)
        s2, w2 = opt.step(s2, 128.0, w, g * 128.0)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
        w = w1


def test_shampoo_trains_quadratic():
    # minimize ||W x - y||^2 for a single 8x8 layer
    opt = ShampooOptimizer(learning_rate=0.05)
    opt.allocate(64, [(8, 8)])
    state = opt.init_state()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    w_true = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    y = w_true @ x
    w = jnp.zeros(64, jnp.float32)

    def loss(wf):
        return jnp.sum((wf.reshape(8, 8) @ x - y) ** 2)

    l0 = float(loss(w))
    step = jax.jit(lambda s, wf: (lambda g: opt.step(s, 1.0, wf, g))(jax.grad(loss)(wf)))
    for _ in range(60):
        state, w = step(state, w)
    assert float(loss(w)) < l0 * 0.05


def test_factory_and_hyperparams_roundtrip():
    opt = create_optimizer({"otype": "Shampoo", "learning_rate": 0.02, "beta3": 0.8})
    hp = opt.hyperparams()
    assert hp["otype"] == "Shampoo"
    assert hp["learning_rate"] == pytest.approx(0.02)
    assert hp["beta3"] == pytest.approx(0.8)
    assert hp["cg_on_momentum"] is True
    opt.update_hyperparams({"learning_rate": 0.5, "identity": 0.05})
    assert opt.learning_rate == pytest.approx(0.5)
    assert opt.identity_strength == pytest.approx(0.05)


def test_trainer_integration():
    import tcnn_tpu as tc

    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Shampoo", "learning_rate": 5e-3},
        "encoding": {"otype": "Identity"},
        "network": {"otype": "CutlassMLP", "n_neurons": 16, "n_hidden_layers": 1},
    }
    m = tc.create_from_config(2, 1, cfg)
    key = jax.random.PRNGKey(0)
    l0 = None
    for i in range(80):
        key, k = jax.random.split(key)
        x = jax.random.uniform(k, (256, 2))
        t = (x[:, :1] * 2 - x[:, 1:] * 0.5 + 0.25)
        lv = m.trainer.training_step(x, t)
        if i == 0:
            l0 = float(lv)
    assert float(lv) < l0 * 0.1
