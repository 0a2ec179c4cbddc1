#!/usr/bin/env bash
# Round-4 on-device battery: the parked r3b measurements (tent/planar kernel
# adjudication, in-model sweeps, XLA flag canary, hardware-gated tests) plus
# an early outage-proof bench capture. Fired by work/wait_and_run.sh the
# moment the tunnel answers, or run directly:
#   nohup bash work/r4_runner.sh > work/r4_runner.log 2>&1 &
set -x
cd /root/repo
date
python -u work/prof_model.py 1024 4 1,2            2>&1 | tail -4
python -u work/prof_fwarp.py 4                     2>&1 | tail -12
python -u work/prof_corr.py 4                      2>&1 | tail -10
python -u work/prof_impls.py 1 4                   2>&1 | tail -10
python -u work/prof_impls.py 2 4                   2>&1 | tail -10
PIV_NO_WARP_BARRIER=1 python -u work/prof_model.py 1024 4 1,2 2>&1 | tail -4
python -u work/prof_v2.py 2 4                      2>&1 | tail -16
python -u work/prof_xla_flags.py 1 4               2>&1 | tail -8
python -u work/prof_guard_tpu.py 4 1024            2>&1 | tail -10
PIV_TPU_TESTS=1 python -m pytest tests -m tpu -q   2>&1 | tail -4
python -u bench.py 2>&1 | tee work/bench_r4_early.txt | tail -3
date
echo "RUNNER DONE"
