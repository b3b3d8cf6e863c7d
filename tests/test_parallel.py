"""Data-parallel (multi-chip) tests on the 8-device CPU mesh.

The reference has no distributed support at all (SURVEY.md 2.9); this is the
NEW capability of the TPU build. Checked here:
  - a sharded training step runs and reduces the loss
  - gradient determinism: the pmean-reduced sharded gradients equal the
    single-device gradients at the same global batch (possible because grid
    scatter is a deterministic XLA reduction, not atomics)
  - training trajectories match between 1-device and 8-device execution
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.parallel.data_parallel import DataParallelTrainer, create_mesh

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
    "network": {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 2},
}


def _img(x):
    return jnp.stack(
        [jnp.sin(5 * x[:, 0]) * 0.5 + 0.5, x[:, 1], x[:, 0] * x[:, 1]], -1
    )


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 virtual devices")
    return ds[:8]


def test_sharded_step_reduces_loss(devices):
    mesh = create_mesh(devices)
    model = tc.create_from_config(2, 3, CFG)
    dp = DataParallelTrainer(model.trainer, mesh)
    state = dp.replicate(model.trainer.state)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1024, 2)), jnp.float32)
    t = _img(x)
    state, l0 = dp.step(state, x, t)
    for _ in range(20):
        state, loss = dp.step(state, x, t)
    assert float(loss) < float(l0) * 0.5


def test_sharded_matches_single_device(devices):
    """The pmean'd sharded step must produce the SAME trajectory as the
    plain single-device step at equal global batch: grid gradients are
    deterministic reductions, so this holds to f32 reduction-order noise."""
    mesh = create_mesh(devices)
    model_a = tc.create_from_config(2, 3, CFG)
    model_b = tc.create_from_config(2, 3, CFG)
    np.testing.assert_array_equal(
        np.asarray(model_a.trainer.state["params"]),
        np.asarray(model_b.trainer.state["params"]),
    )

    dp = DataParallelTrainer(model_a.trainer, mesh)
    state_sh = dp.replicate(model_a.trainer.state)

    rng = np.random.default_rng(1)
    for i in range(5):
        x = jnp.asarray(rng.uniform(size=(1024, 2)), jnp.float32)
        t = _img(x)
        state_sh, loss_sh = dp.step(state_sh, x, t)
        loss_1 = model_b.trainer.training_step(x, t)
        # per-shard 1/n_local normalization + pmean == global 1/n
        np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-3)
        if i == 0:
            # after ONE step the parameters agree to f32 reduction-order
            # noise (the scatter itself is deterministic). Over longer
            # trajectories Adam's exact-zero lazy-skip rule (adam.h:77-84)
            # amplifies reduction-order flips of ~1e-12 grads into visible
            # per-param drift, so only the losses are compared there.
            np.testing.assert_allclose(
                np.asarray(state_sh["params"]),
                np.asarray(model_b.trainer.state["params"]),
                rtol=1e-3,
                atol=2e-5,
            )


def test_gradient_allclose_across_shardings(devices):
    """pmean of per-shard grads == global-batch grads (up to f32 order)."""
    mesh = create_mesh(devices)
    model = tc.create_from_config(2, 3, CFG)
    trainer = model.trainer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2048, 2)), jnp.float32)
    t = _img(x)
    pdf = jnp.ones_like(t)
    key = jax.random.PRNGKey(0)

    _, g_global = trainer.loss_and_grad_fn(trainer.state["params"], x, t, pdf, key)

    from jax.sharding import PartitionSpec as P

    def shard_fn(params, xx, tt, pp):
        _, g = trainer.loss_and_grad_fn(params, xx, tt, pp, key)
        return jax.lax.pmean(g, "data")

    g_sharded = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )(trainer.state["params"], x, t, pdf)

    ref = np.asarray(g_global)
    got = np.asarray(g_sharded)
    scale = max(np.abs(ref).max(), 1e-9)
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)
