#!/bin/bash
# Round-5 battery H: clean re-run of the train-step candidates (the F/G
# runner chain got tangled after a script overwrite — unique filename now,
# one battery, strictly serial) + the inference batch sweeps.
set -x
cd /root/repo
PIV_CONV_WGRAD=stride2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_s2wgrad.log 2>&1
PIV_NETC_JOINT=on timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_netcjoint.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=3 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry3.log 2>&1
PIV_CONV_WGRAD=stride2 PIV_NETC_JOINT=on timeout -k 15 1800 python -u work/prof_train.py bf16 > work/r5_train_s2joint.log 2>&1
timeout -k 15 3600 python -u work/prof_r5_batch.py 2 1024 > work/r5_batch_v2.log 2>&1
timeout -k 15 3600 python -u work/prof_r5_batch.py 1 1024 > work/r5_batch_v1.log 2>&1
echo DONE
