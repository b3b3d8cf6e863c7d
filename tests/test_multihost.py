"""Multi-host (2-process) data-parallel tests over CPU gloo collectives.

SURVEY.md §4 test-plan item (d): multi-host tests via jax.distributed.
Spawns 2 real processes x 4 virtual CPU devices each (one 8-device global
mesh), runs DataParallelTrainer steps with per-host on-device batch
generation, and asserts:
  - both hosts hold IDENTICAL parameters after training (the determinism
    guarantee the reference's atomicAdd scatter cannot offer), and
  - the multi-process result matches the single-process 8-device result
    for the same global batch.
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())  # repo root (the spawning test sets cwd)
pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import tcnn_tpu as tc
from tcnn_tpu.parallel import (
    DataParallelTrainer, global_batch, global_mesh, host_shard_key,
    init_distributed,
)

ppid, pcount = init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert (ppid, pcount) == (pid, 2), (ppid, pcount)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np

CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "HashGrid", "n_levels": 6,
                 "n_features_per_level": 2, "log2_hashmap_size": 12,
                 "base_resolution": 4, "per_level_scale": 1.5},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 2},
}

def target(x):
    return jnp.stack([jnp.sin(4 * x[:, 0]), jnp.cos(3 * x[:, 1]),
                      x[:, 0] * x[:, 1]], -1)

m = tc.create_from_config(2, 3, CONFIG)
mesh = global_mesh()
dp = DataParallelTrainer(m.trainer, mesh)
state = dp.replicate(m.trainer.state)

GLOBAL_B = 1024
LOCAL_B = GLOBAL_B // pcount
base_key = jax.random.PRNGKey(7)
for step in range(5):
    # per-host on-device generation of this host's shard
    k = host_shard_key(base_key, step)
    x_local = jax.random.uniform(k, (LOCAL_B, 2))
    y_local = target(x_local)
    x, y = global_batch(mesh, (x_local, y_local), GLOBAL_B)
    state, loss = dp.step(state, x, y)

params = np.asarray(jax.device_get(state["params"]))
np.save(os.path.join(outdir, f"params_{pid}.npy"), params)
with open(os.path.join(outdir, f"done_{pid}.json"), "w") as f:
    json.dump({"loss": float(loss)}, f)

# single-process-equivalent global batch for the cross-check: rebuild every
# host's shard locally (the shard keys are public knowledge)
shards = []
for hp in range(pcount):
    kk = jax.random.fold_in(jax.random.PRNGKey(7), hp)
    # final step's key
    kk = jax.random.fold_in(kk, 4)
    shards.append(jax.random.uniform(kk, (LOCAL_B, 2)))
np.save(os.path.join(outdir, f"lastbatch_{pid}.npy"),
        np.concatenate([np.asarray(s) for s in shards]))
"""


@pytest.mark.slow
def test_two_process_dp_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = "23457"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=pathlib.Path(__file__).parent.parent,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"worker {pid} failed:\n{outs[pid][-4000:]}"

    p0 = np.load(tmp_path / "params_0.npy")
    p1 = np.load(tmp_path / "params_1.npy")
    # determinism across hosts: identical replicated params
    np.testing.assert_array_equal(p0, p1)
    loss0 = json.loads((tmp_path / "done_0.json").read_text())["loss"]
    loss1 = json.loads((tmp_path / "done_1.json").read_text())["loss"]
    assert loss0 == loss1
    assert np.isfinite(loss0)

    # cross-check vs the single-process 8-device path on the same batches
    import jax

    import tcnn_tpu as tc
    from tcnn_tpu.parallel import DataParallelTrainer, create_mesh, host_shard_key
    import jax.numpy as jnp

    CONFIG = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 6,
                     "n_features_per_level": 2, "log2_hashmap_size": 12,
                     "base_resolution": 4, "per_level_scale": 1.5},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }

    def target(x):
        return jnp.stack([jnp.sin(4 * x[:, 0]), jnp.cos(3 * x[:, 1]),
                          x[:, 0] * x[:, 1]], -1)

    m = tc.create_from_config(2, 3, CONFIG)
    dp = DataParallelTrainer(m.trainer, create_mesh())
    state = dp.replicate(m.trainer.state)
    for step in range(5):
        shards = []
        for hp in range(2):
            kk = jax.random.fold_in(jax.random.PRNGKey(7), hp)
            kk = jax.random.fold_in(kk, step)
            shards.append(jax.random.uniform(kk, (512, 2)))
        x = jnp.concatenate(shards)
        state, loss = dp.step(state, x, target(x))
    p_single = np.asarray(jax.device_get(state["params"]))
    np.testing.assert_allclose(p0, p_single, atol=2e-6, rtol=1e-5)
