#!/bin/bash
# r4k battery: cheap-guard re-measure + warp-bwd attribution.
# Waits for the r4j sweep to release the chip first.
set -x
cd /root/repo
export JAX_PLATFORMS=
while kill -0 "$(cat /tmp/r4j.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
timeout -k 15 3600 python -u work/prof_impls.py 1 4 1024 guard > work/impls_r4k_v1.log 2>&1
date; echo "R4K GUARD V1 DONE"
timeout -k 15 3600 python -u work/prof_impls.py 2 4 1024 guard > work/impls_r4k_v2.log 2>&1
date; echo "R4K GUARD V2 DONE"
timeout -k 15 2400 python -u work/prof_warpbwd.py 8 256 32 > work/warpbwd.log 2>&1
date; echo "R4K WARPBWD DONE"
timeout -k 15 2400 python -u work/prof_train.py bf16 > work/train_r4k.log 2>&1
date; echo "R4K TRAIN DONE"
