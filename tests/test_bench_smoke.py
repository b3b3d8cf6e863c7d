"""bench.py smoke test: the driver's flagship entry point must keep
producing its one-line JSON contract ({metric, value, unit, vs_baseline})
even as the library underneath it evolves. Runs the real script as a
subprocess on CPU at toy sizes (env overrides; the TPU invocation uses
the defaults)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_json_contract():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        TCNN_BENCH_LOG2_BATCH="10",
        TCNN_BENCH_WARMUP="10",
        TCNN_BENCH_STEPS="10",
    )
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["unit"] == "samples/s"
    assert rec["value"] > 0
    assert 0 < rec["vs_baseline"] < 1e6
    assert rec["context"]["inference_samples_per_sec"] > 0
    # the model must actually be learning, not just running
    assert rec["context"]["final_loss"] < 1.0
