#!/bin/bash
# Round-5 battery A: wall attribution before any kernel build (VERDICT #1/#2
# preconditions + the ingest measurement). Serialized — one chip, one core.
set -x
cd /root/repo
# host-only ingest measurement first (no TPU; needs the idle core)
timeout -k 15 900 python -u work/prof_ingest_packed.py 64 1024 > work/ingest_packed.log 2>&1
# train-step backward wall attribution (decides scatter kernel vs conv bwd)
timeout -k 15 3600 python -u work/prof_r5_wall.py > work/r5_wall.log 2>&1
# v2 + v1 inference wall decomposition (13 ablations each)
timeout -k 15 5400 python -u work/prof_r5_v2wall.py 2 4 1024 > work/r5_v2wall.log 2>&1
timeout -k 15 5400 python -u work/prof_r5_v2wall.py 1 4 1024 > work/r5_v1wall.log 2>&1
echo DONE
