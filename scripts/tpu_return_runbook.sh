#!/bin/bash
# Priority-ordered measurement plan for when the axon tunnel returns
# (round 3, tunnel down since Aug 17 ~13:00 UTC). Stop the passive
# chains first if running this manually: they duplicate some steps.
#
#   bash scripts/tpu_return_runbook.sh 2>&1 | tee /tmp/runbook.log
#
# Order = value per minute if the tunnel dies again:
#   1. headline probe (picks the production fused-step knobs)
#   2. autotuned bench (the driver metric, with the staged candidates)
#   3. A_LOOP compile sweep (the cold-compile verdict)
#   4. hw test tier (parity at production shapes)
#   5. receipts + binned sweep + mesh overhead (PERF.md numbers)
set -x
cd /root/repo
timeout 5400 python -u scripts/probe_r3_headline.py 2>&1 | tee /tmp/rb_probe.log
timeout 5400 python -u bench.py 2>&1 | tee /tmp/rb_bench.log
timeout 5400 python -u scripts/profile_binned_compile.py aloop 2>&1 | tee /tmp/rb_aloop.log
TCNN_COLD=1 timeout 5400 python -u scripts/profile_binned_compile.py aloop 2>&1 | tee /tmp/rb_aloop_cold.log
TCNN_TPU_TESTS=1 timeout 5400 python -m pytest tests/ -m tpu -q 2>&1 | tee /tmp/rb_hw.log
timeout 7200 python -u scripts/receipts_r3.py 2>&1 | tee /tmp/rb_receipts.log
timeout 5400 python -u scripts/profile_binned_compile.py 2>&1 | tee /tmp/rb_compile.log
timeout 7200 python -u scripts/sweep_binned_a.py 2>&1 | tee /tmp/rb_sweep.log
timeout 3600 python -u scripts/mesh_overhead_tpu.py 2>&1 | tee /tmp/rb_mesh.log
echo "runbook done: $(date)"
