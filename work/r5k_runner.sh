#!/bin/bash
# Round-5 battery K: ry=1 probe (25 taps; monotone ry trend says smaller is
# faster while the guard holds) + the tent-vs-gather loss-curve equivalence
# at the winning radius. Waits for battery J.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5j.pid)" 2>/dev/null; do sleep 20; done
PIV_WARP_VJP=tent PIV_TVJP_RY=1 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry1.log 2>&1
PIV_TVJP_RY=2 timeout -k 15 2400 python -u work/prof_r5_curves.py > work/r5_curves_tent.log 2>&1
echo DONE
