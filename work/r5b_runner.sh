#!/bin/bash
# Round-5 battery B: wgrad shifted-GEMM microbench, on-device warp-VJP kernel
# validation, and the in-model tent-VJP train A/B. Waits for battery A's pid.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5a.pid)" 2>/dev/null; do sleep 20; done
# conv weight-grad: autodiff vs shifted-GEMM reformulation
timeout -k 15 3600 python -u work/prof_r5_wgrad.py > work/r5_wgrad.log 2>&1
# Mosaic lowering of the tent-transpose kernel (device rules don't surface
# in interpret mode)
PIV_TPU_TESTS=1 timeout -k 15 2400 python -m pytest tests/test_pallas_ondevice.py -m tpu -k warp_vjp_tent -q > work/r5_tpu_warpvjp.log 2>&1
# in-model train A/B: gather VJP vs tent VJP (bf16 reference config)
PIV_WARP_VJP=gather timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_gathervjp.log 2>&1
PIV_WARP_VJP=tent timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp.log 2>&1
echo DONE
