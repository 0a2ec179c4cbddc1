#!/bin/bash
# r4h: probes pending after the 01:35 host restart (cache wiped).
set -x
cd /root/repo
export JAX_PLATFORMS=
timeout -k 15 2400 python -u work/prof_gather2d.py 4 1024 64 > work/gather2d.log 2>&1
date; echo "R4H GATHER2D DONE"
timeout -k 15 2400 python -u work/prof_trace_train.py > work/trace_train.log 2>&1
date; echo "R4H TRACE_TRAIN DONE"
