#!/bin/bash
# Round-5 battery F2 (replaces the killed F/G): train-step candidates in
# decision order, then the inference batch sweeps. Waits for battery E.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5e.pid)" 2>/dev/null; do sleep 20; done
# 1) stride2-only wgrad (the microbench split: XLA wins stride-1, loses s2)
PIV_CONV_WGRAD=stride2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_s2wgrad.log 2>&1
# 2) joint 2B-batch NetC in the grad program (halves strided-wgrad count)
PIV_NETC_JOINT=on timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_netcjoint.log 2>&1
# 3) tent-VJP tap-radius sweep (ry=4 lost by 3.8 ms; ry=2 is 49 vs 121 taps)
PIV_WARP_VJP=tent PIV_TVJP_RY=2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry2.log 2>&1
# 4) combos of whatever won individually get a dedicated battery later
PIV_CONV_WGRAD=stride2 PIV_NETC_JOINT=on timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_s2joint.log 2>&1
# 5) inference batch sweeps (battery D re-arm)
timeout -k 15 3600 python -u work/prof_r5_batch.py 2 1024 > work/r5_batch_v2.log 2>&1
timeout -k 15 3600 python -u work/prof_r5_batch.py 1 1024 > work/r5_batch_v1.log 2>&1
echo DONE
