#!/bin/bash
# Round-5 battery C: in-model conv-wgrad A/B (+ the combined build). Waits
# for battery B.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5b.pid)" 2>/dev/null; do sleep 20; done
PIV_CONV_WGRAD=shift timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_shiftwgrad.log 2>&1
PIV_CONV_WGRAD=shift PIV_WARP_VJP=tent timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_combo.log 2>&1
# f32 sanity of the combined build (layout regressions sometimes dtype-bound)
PIV_CONV_WGRAD=shift timeout -k 15 1800 python -u work/prof_train.py f32 > work/r5_train_shiftwgrad_f32.log 2>&1
echo DONE
