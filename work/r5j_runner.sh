#!/bin/bash
# Round-5 battery J: train scheduling flag (never swept on the GRAD program;
# the wgrad wall 55.7 ms >> its ~10-15 ms busy sum is a scheduling gap),
# the winning-combo build, and the revised on-device warp-VJP tests.
# Waits for battery I.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5i.pid)" 2>/dev/null; do sleep 20; done
# latency-hiding scheduler on the train program (baseline + tent-ry2)
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_lhs.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_lhs_ry2.log 2>&1
# candidate-combo: tent ry2 + pool downsample
PIV_WARP_VJP=tent PIV_TVJP_RY=2 PIV_RESIZE_HALF=pool timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_ry2_pool.log 2>&1
# revised on-device warp-VJP tests (bf16 flow cast + accuracy-vs-truth)
PIV_TPU_TESTS=1 timeout -k 15 2400 python -m pytest tests/test_pallas_ondevice.py -m tpu -k "warp_vjp or tvjp" -q -p no:cacheprovider > work/r5_tpu_warpvjp2.log 2>&1
echo DONE
