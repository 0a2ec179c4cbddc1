#!/bin/bash
# Round-5 battery I: pool-downsample A/B (in-model, v2+v1+train), the
# depthwise-deconv wgrad microbench, and uncontended baseline re-measures.
# Waits for battery H.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5h.pid)" 2>/dev/null; do sleep 20; done
# in-model pool vs einsum factor-2 downsample
PIV_RESIZE_HALF=pool timeout -k 15 1800 python -u work/prof_r5_infer.py 2 4 1024 > work/r5_pool_v2.log 2>&1
PIV_RESIZE_HALF=einsum timeout -k 15 1800 python -u work/prof_r5_infer.py 2 4 1024 > work/r5_einsum_v2.log 2>&1
PIV_RESIZE_HALF=pool timeout -k 15 1800 python -u work/prof_r5_infer.py 1 4 1024 > work/r5_pool_v1.log 2>&1
PIV_RESIZE_HALF=einsum timeout -k 15 1800 python -u work/prof_r5_infer.py 1 4 1024 > work/r5_einsum_v1.log 2>&1
PIV_RESIZE_HALF=pool timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_pool.log 2>&1
# depthwise-deconv wgrad microbench (decides whether to build the VJP)
timeout -k 15 2400 python -u work/prof_r5_dwgrad.py > work/r5_dwgrad.log 2>&1
echo DONE
