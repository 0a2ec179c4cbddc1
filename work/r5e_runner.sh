#!/bin/bash
# Round-5 battery E: re-arm of the restart-killed B+C+D chain, serialized in
# one script (one chip, one core). Order: cheapest decision-critical first.
set -x
cd /root/repo
# --- battery B: wgrad microbench + on-device warp-VJP kernel validation +
#     in-model tent-VJP train A/B
timeout -k 15 3600 python -u work/prof_r5_wgrad.py > work/r5_wgrad.log 2>&1
PIV_TPU_TESTS=1 timeout -k 15 2400 python -m pytest tests/test_pallas_ondevice.py -m tpu -k warp_vjp_tent -q -p no:cacheprovider > work/r5_tpu_warpvjp.log 2>&1
PIV_WARP_VJP=gather timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_gathervjp.log 2>&1
PIV_WARP_VJP=tent timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp.log 2>&1
# --- battery C: in-model conv-wgrad A/B (+ the combined build)
PIV_CONV_WGRAD=shift timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_shiftwgrad.log 2>&1
PIV_CONV_WGRAD=shift PIV_WARP_VJP=tent timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_combo.log 2>&1
PIV_CONV_WGRAD=shift timeout -k 15 1800 python -u work/prof_train.py f32 > work/r5_train_shiftwgrad_f32.log 2>&1
echo DONE
