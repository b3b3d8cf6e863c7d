"""Optimizer parity tests against literal scalar re-implementations of the
reference kernels (adam.h:47-121, sgd.h:45-70, novograd.h:45-140) and the
wrapper behaviors."""

import jax
import jax.numpy as jnp
import numpy as np

from tcnn_tpu.registry import create_optimizer

N_MATRIX = 6  # pretend first 6 params form a (2,3) matrix layer
LAYERS = [(2, 3)]
N = 10  # + 4 non-matrix params
LOSS_SCALE = 128.0


def _reference_adam(weights, grads_seq, hp):
    """Literal transcription of adam_step (adam.h:47-121)."""
    w = weights.astype(np.float64).copy()
    m1 = np.zeros(N)
    m2 = np.zeros(N)
    steps = np.zeros(N, np.int64)
    for grads in grads_seq:
        for i in range(N):
            g = grads[i] / LOSS_SCALE
            if i >= N_MATRIX:
                if g == 0:
                    continue
            g_eff = g + hp["l2_reg"] * w[i] if i < N_MATRIX else g
            m1[i] = hp["beta1"] * m1[i] + (1 - hp["beta1"]) * g_eff
            m2[i] = hp["beta2"] * m2[i] + (1 - hp["beta2"]) * g_eff * g_eff
            lr = hp["learning_rate"]
            steps[i] += 1
            lr *= np.sqrt(1 - hp["beta2"] ** steps[i]) / (
                1 - hp["beta1"] ** steps[i]
            )
            eff = lr / (np.sqrt(m2[i]) + hp["epsilon"])
            w[i] = w[i] - eff * m1[i]
    return w


def test_adam_matches_reference_including_lazy_steps():
    hp = dict(learning_rate=1e-2, beta1=0.9, beta2=0.99, epsilon=1e-15,
              l2_reg=1e-6)
    opt = create_optimizer({"otype": "Adam", **hp})
    opt.allocate(N, LAYERS)
    state = opt.init_state()

    rng = np.random.default_rng(0)
    w = rng.normal(size=N).astype(np.float32)
    w0 = w.copy()
    grads_seq = []
    for step in range(5):
        g = rng.normal(size=N).astype(np.float32) * LOSS_SCALE
        # make some non-matrix grads exactly zero to exercise lazy stepping
        g[7] = 0.0
        if step % 2 == 0:
            g[9] = 0.0
        grads_seq.append(g)

    wj = jnp.asarray(w)
    for g in grads_seq:
        state, wj = opt.step(state, LOSS_SCALE, wj, jnp.asarray(g))

    expected = _reference_adam(w0, grads_seq, hp)
    np.testing.assert_allclose(np.asarray(wj), expected, rtol=1e-4, atol=1e-6)
    # param 7 never stepped
    assert int(state["param_steps"][7]) == 0
    assert int(state["param_steps"][9]) == 2
    assert int(state["param_steps"][0]) == 5


def test_sgd():
    opt = create_optimizer({"otype": "SGD", "learning_rate": 0.1, "l2_reg": 0.01})
    opt.allocate(4, [])
    state = opt.init_state()
    w = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    g = jnp.asarray([0.5, 0.5, -1.0, 0.0]) * LOSS_SCALE
    state, w2 = opt.step(state, LOSS_SCALE, w, g)
    expected = np.asarray(w) - 0.1 * (np.asarray(g) / LOSS_SCALE + 0.01 * np.asarray(w))
    np.testing.assert_allclose(np.asarray(w2), expected, rtol=1e-6)


def test_novograd_ignores_non_matrix():
    opt = create_optimizer({"otype": "Novograd", "learning_rate": 1e-2})
    opt.allocate(N, LAYERS)
    state = opt.init_state()
    w = jnp.asarray(np.arange(N, dtype=np.float32))
    g = jnp.asarray(np.ones(N, np.float32)) * LOSS_SCALE
    state, w2 = opt.step(state, LOSS_SCALE, w, g)
    # non-matrix params untouched (novograd.h step loops over layers only)
    np.testing.assert_allclose(np.asarray(w2[N_MATRIX:]), np.asarray(w[N_MATRIX:]))
    assert not np.allclose(np.asarray(w2[:N_MATRIX]), np.asarray(w[:N_MATRIX]))


def test_ema_custom_weights_debias():
    opt = create_optimizer(
        {"otype": "EMA", "decay": 0.5, "nested": {"otype": "SGD", "learning_rate": 0.0}}
    )
    opt.allocate(2, [])
    state = opt.init_state()
    w = jnp.asarray([1.0, 2.0])
    for _ in range(3):
        state, w = opt.step(state, 1.0, w, jnp.zeros(2))
    # with lr 0, weights constant; debiased EMA of a constant is the constant
    cw = np.asarray(opt.custom_weights(state, w))
    np.testing.assert_allclose(cw, [1.0, 2.0], rtol=1e-6)


def test_average_sliding_window():
    opt = create_optimizer(
        {"otype": "Average", "n_samples": 2,
         "nested": {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0}}
    )
    opt.allocate(1, [])
    state = opt.init_state()
    w = jnp.asarray([10.0])
    ws = []
    for _ in range(4):
        state, w = opt.step(state, 1.0, w, jnp.asarray([1.0]))
        ws.append(float(w[0]))
    # w: 9, 8, 7, 6; average of last 2 = 6.5
    cw = float(np.asarray(opt.custom_weights(state, w))[0])
    np.testing.assert_allclose(cw, (ws[-1] + ws[-2]) / 2, rtol=1e-6)


def test_lookahead_sync():
    opt = create_optimizer(
        {"otype": "Lookahead", "alpha": 0.5, "n_steps": 2,
         "nested": {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0}}
    )
    opt.allocate(1, [])
    state = opt.init_state()
    w = jnp.asarray([0.0])
    # step 0: slow=0, sync blend -> 0; sgd: w=-1... walk a few steps and just
    # check the slow weights only move on sync steps
    slows = []
    for _ in range(5):
        state, w = opt.step(state, 1.0, w, jnp.asarray([-1.0]))
        slows.append(float(state["slow"][0]))
    assert slows[0] == slows[1]  # no sync at t=1
    assert slows[1] != slows[2]  # sync at t=2


def test_batched_accumulates():
    opt = create_optimizer(
        {"otype": "Batched", "batch_size_multiplier": 4,
         "nested": {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0}}
    )
    opt.allocate(1, [])
    state = opt.init_state()
    w = jnp.asarray([0.0])
    for i in range(8):
        state, w = opt.step(state, 1.0, w, jnp.asarray([4.0]))
    # each window of 4 steps applies one SGD step with averaged grad 4/4*4=4.0
    # wait: pool accumulates g/N each step => pool = 4*4/4 = 4 after a window
    np.testing.assert_allclose(float(w[0]), -8.0, rtol=1e-6)


def test_exponential_decay_factor():
    opt = create_optimizer(
        {"otype": "ExponentialDecay", "decay_base": 0.5, "decay_start": 2,
         "decay_end": 100, "decay_interval": 2,
         "nested": {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0}}
    )
    opt.allocate(1, [])
    state = opt.init_state()
    w = jnp.asarray([0.0])
    deltas = []
    prev = 0.0
    for i in range(6):
        state, w = opt.step(state, 1.0, w, jnp.asarray([1.0]))
        deltas.append(prev - float(w[0]))
        prev = float(w[0])
    # nested steps BEFORE decay_start use lr 1.0; at nested-step counts 2 and
    # 4 the factor halves
    np.testing.assert_allclose(deltas, [1.0, 1.0, 0.5, 0.5, 0.25, 0.25], rtol=1e-6)


def test_composite_partitions():
    opt = create_optimizer(
        {"otype": "Composite", "nested": [
            {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0,
             "n_params_to_optimize": 2},
            {"otype": "SGD", "learning_rate": 0.0, "l2_reg": 0.0},
        ]}
    )
    opt.allocate(5, [])
    state = opt.init_state()
    w = jnp.asarray(np.ones(5, np.float32))
    state, w2 = opt.step(state, 1.0, w, jnp.asarray(np.ones(5, np.float32)))
    np.testing.assert_allclose(np.asarray(w2), [0, 0, 1, 1, 1], atol=1e-6)


def test_optimizer_step_is_jittable():
    opt = create_optimizer({"otype": "Adam", "learning_rate": 1e-2})
    opt.allocate(N, LAYERS)
    state = opt.init_state()
    w = jnp.ones(N)
    g = jnp.ones(N)

    @jax.jit
    def step(s, w, g):
        return opt.step(s, LOSS_SCALE, w, g)

    s2, w2 = step(state, w, g)
    assert w2.shape == (N,)
