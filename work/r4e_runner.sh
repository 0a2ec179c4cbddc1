#!/usr/bin/env bash
# Round-4e sequential TPU battery: runs after the copts v1 sweep exits.
# Each stage time-boxed; logs under work/. Launch:
#   nohup bash work/r4e_runner.sh <copts_pid> > work/r4e_runner.log 2>&1 &
set -x
cd /root/repo

COPTS_PID="${1:-}"
if [ -n "$COPTS_PID" ]; then
  while kill -0 "$COPTS_PID" 2>/dev/null; do sleep 30; done
fi

timeout -k 15 1800 python -u work/prof_guard_tpu.py 4 1024 > work/guard_tpu_r4e.log 2>&1
timeout -k 15 2400 python -u work/prof_netc.py 1 4 256,512,1024 > work/netc_v1.log 2>&1
timeout -k 15 2400 python -u work/prof_netc.py 2 4 256,512,1024 > work/netc_v2.log 2>&1
timeout -k 15 1200 python -u work/prof_netc.py 1 8 256 > work/netc_v1_b8.log 2>&1
timeout -k 15 2400 python -u work/prof_v2_batch.py 2 8,16 1024 > work/v2_batch.log 2>&1
timeout -k 15 1800 python -u work/prof_v2_batch.py 1 8 1024 > work/v1_batch.log 2>&1
timeout -k 15 3600 python -u work/prof_copts.py v2 4 > work/copts_v2.log 2>&1
date
echo "R4E RUNNER DONE"
