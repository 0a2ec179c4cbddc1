#!/bin/bash
# Round-5 battery G: tent-VJP tap-radius sweep (ry=4 lost in-model by 3.8
# ms/step; ry=2 is 49 taps vs 121) + the winning-wgrad combo. Waits for F.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5f.pid)" 2>/dev/null; do sleep 20; done
PIV_WARP_VJP=tent PIV_TVJP_RY=2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=3 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry3.log 2>&1
echo DONE
