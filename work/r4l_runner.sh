#!/bin/bash
# r4l battery: parity NetC head in-model (v2) + 512^2 check. Chains after r4k.
set -x
cd /root/repo
export JAX_PLATFORMS=
while kill -0 "$(cat /tmp/r4k.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
timeout -k 15 3600 python -u work/prof_impls.py 2 4 1024 head > work/head_v2_1024.log 2>&1
date; echo "R4L HEAD V2 1024 DONE"
timeout -k 15 2400 python -u work/prof_impls.py 2 8 512 head > work/head_v2_512.log 2>&1
date; echo "R4L HEAD V2 512 DONE"
