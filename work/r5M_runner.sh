#!/bin/bash
# Round-5 battery M (replaces L after the XLA_FLAGS-crash fix): decision
# order = train controls, latency-hiding scheduler via compiler_options on
# the GRAD program (the validated route on this rig; XLA_FLAGS aborts),
# ry=1 probe, pool downsample, v2 pool A/B, on-device VJP tests, curves.
# Every step is boxed and nothing starts after END_BY so the driver's
# bench run never contends with leftovers.
set -x
cd /root/repo
END_BY=$(( $(date +%s) + 2820 ))   # no new step after ~47 min from launch
HARD=$(( END_BY + 480 ))
T() {
  local now left
  now=$(date +%s)
  [ "$now" -ge "$END_BY" ] && { echo "SKIP (past END_BY): $*"; return 0; }
  left=$(( HARD - now )); [ "$left" -gt 1200 ] && left=1200
  timeout -k 15 "$left" "$@"
}
T python -u work/prof_train.py bf16 > work/r5_train_base2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 T python -u work/prof_train.py bf16 > work/r5_train_ry2b.log 2>&1
T python -u work/prof_r5_train_copts.py lhs > work/r5_train_copts_lhs.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 T python -u work/prof_r5_train_copts.py lhs > work/r5_train_copts_lhs_ry2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=1 T python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry1.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 PIV_RESIZE_HALF=pool T python -u work/prof_train.py bf16 > work/r5_train_ry2_pool.log 2>&1
T python -u work/prof_r5_infer.py 2 4 1024 > work/r5_einsum_v2.log 2>&1
PIV_RESIZE_HALF=pool T python -u work/prof_r5_infer.py 2 4 1024 > work/r5_pool_v2.log 2>&1
PIV_TPU_TESTS=1 T python -m pytest tests/test_pallas_ondevice.py -m tpu -k "warp_vjp or tvjp" -q -p no:cacheprovider > work/r5_tpu_warpvjp2.log 2>&1
PIV_TVJP_RY=2 T python -u work/prof_r5_curves.py > work/r5_curves_tent.log 2>&1
echo DONE
