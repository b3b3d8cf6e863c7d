"""Seeded config fuzz: random (encoding x network x loss x optimizer)
combinations through create_from_config must train to finite, decreasing
loss. Catches integration gaps (alignment negotiation, padding contracts,
wrapper optimizers, odd widths) that unit tests miss."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc

ENCODINGS = [
    {"otype": "HashGrid", "n_levels": 4, "log2_hashmap_size": 9,
     "base_resolution": 4},
    {"otype": "DenseGrid", "n_levels": 3, "base_resolution": 4,
     "per_level_scale": 1.5},
    {"otype": "OneBlob", "n_bins": 5},
    {"otype": "Frequency", "n_frequencies": 3},
    {"otype": "TriangleWave", "n_frequencies": 4},
    {"otype": "Identity"},
    {"otype": "Composite", "nested": [
        {"otype": "Frequency", "n_frequencies": 2, "n_dims_to_encode": 1},
        {"otype": "Identity"},
    ]},
]
NETWORKS = [
    {"otype": "FullyFusedMLP", "n_neurons": 16, "n_hidden_layers": 1},
    {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 2,
     "output_activation": "Sigmoid"},
    {"otype": "CutlassMLP", "n_neurons": 24, "n_hidden_layers": 1},
    {"otype": "CutlassMLP", "n_neurons": 48, "n_hidden_layers": 0},
]
LOSSES = ["L2", "RelativeL2", "L1", "SMAPE", "MAPE", "RelativeL1"]
OPTIMIZERS = [
    {"otype": "Adam", "learning_rate": 5e-3},
    {"otype": "SGD", "learning_rate": 5e-3},
    {"otype": "Novograd", "learning_rate": 5e-3},
    {"otype": "EMA", "decay": 0.9,
     "nested": {"otype": "Adam", "learning_rate": 5e-3}},
    {"otype": "ExponentialDecay", "decay_base": 0.5, "decay_start": 5,
     "decay_end": 20, "decay_interval": 5,
     "nested": {"otype": "Adam", "learning_rate": 5e-3}},
    {"otype": "Lookahead", "n_steps": 4,
     "nested": {"otype": "Adam", "learning_rate": 5e-3}},
]


def _cases(n=18, seed=7):
    rng = np.random.default_rng(seed)
    all_combos = list(itertools.product(
        range(len(ENCODINGS)), range(len(NETWORKS)),
        range(len(LOSSES)), range(len(OPTIMIZERS)),
    ))
    picks = rng.choice(len(all_combos), size=n, replace=False)
    return [all_combos[i] for i in picks]


@pytest.mark.parametrize("ei,ni,li,oi", _cases())
def test_random_config_trains(ei, ni, li, oi):
    cfg = {
        "loss": {"otype": LOSSES[li]},
        "optimizer": OPTIMIZERS[oi],
        "encoding": ENCODINGS[ei],
        "network": NETWORKS[ni],
    }
    m = tc.create_from_config(2, 2, cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        key, k = jax.random.split(key)
        x = jax.random.uniform(k, (512, 2))
        t = jnp.stack([x[:, 0] * 0.5 + 0.2, jnp.sin(3 * x[:, 1]) * 0.3 + 0.5], -1)
        lv = m.trainer.training_step(x, t)
        losses.append(float(lv))
    assert np.isfinite(losses).all(), cfg
    # Novograd only updates matrix (network) weights (novograd.h loops over
    # layers only - replicated): with a parametric encoding the tables stay
    # frozen, so monotone descent is not guaranteed; require finiteness and
    # boundedness there.
    novograd_with_tables = (
        OPTIMIZERS[oi]["otype"] == "Novograd"
        and "Grid" in ENCODINGS[ei]["otype"]
    )
    if novograd_with_tables:
        assert losses[-1] < losses[0] * 2, (cfg, losses[0], losses[-1])
    else:
        assert losses[-1] < losses[0], (cfg, losses[0], losses[-1])
    # inference must be finite and the right shape
    y = m.trainer.inference(jnp.full((7, 2), 0.4))
    assert y.shape == (7, 2) and np.isfinite(np.asarray(y)).all()
