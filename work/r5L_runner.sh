#!/bin/bash
# Round-5 battery L (post-restart consolidation of the unrun I/J/K items):
# 1) fresh-host train baseline + tent-ry2 control (the previous host's
#    150.9/145.1 numbers need re-anchoring),
# 2) latency-hiding scheduler on the GRAD program (the 55.7 ms wgrad wall
#    is scheduling, not kernels — never swept there),
# 3) ry=1 probe (monotone trend says smaller is faster while guards hold),
# 4) pool factor-2 downsample in-model (train + v2 + v1),
# 5) loss-curve equivalence at the winning radius + on-device VJP tests.
set -x
cd /root/repo
T() { timeout -k 15 1800 "$@"; }
T python -u work/prof_train.py bf16 > work/r5_train_base2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 T python -u work/prof_train.py bf16 > work/r5_train_ry2b.log 2>&1
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" T python -u work/prof_train.py bf16 > work/r5_train_lhs.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" T python -u work/prof_train.py bf16 > work/r5_train_lhs_ry2.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=1 T python -u work/prof_train.py bf16 > work/r5_train_tentvjp_ry1.log 2>&1
PIV_WARP_VJP=tent PIV_TVJP_RY=2 PIV_RESIZE_HALF=pool T python -u work/prof_train.py bf16 > work/r5_train_ry2_pool.log 2>&1
T python -u work/prof_r5_infer.py 2 4 1024 > work/r5_einsum_v2.log 2>&1
PIV_RESIZE_HALF=pool T python -u work/prof_r5_infer.py 2 4 1024 > work/r5_pool_v2.log 2>&1
T python -u work/prof_r5_infer.py 1 4 1024 > work/r5_einsum_v1.log 2>&1
PIV_RESIZE_HALF=pool T python -u work/prof_r5_infer.py 1 4 1024 > work/r5_pool_v1.log 2>&1
PIV_TPU_TESTS=1 timeout -k 15 2400 python -m pytest tests/test_pallas_ondevice.py -m tpu -k "warp_vjp or tvjp" -q -p no:cacheprovider > work/r5_tpu_warpvjp2.log 2>&1
PIV_TVJP_RY=2 timeout -k 15 2400 python -u work/prof_r5_curves.py > work/r5_curves_tent.log 2>&1
echo DONE
