#!/bin/bash
# Round-5 battery N: (1) pool-downsample A/B through bench's OWN v2 child
# (the A/B and the driver-bench cache warm are the same run), (2) warm the
# persistent compile cache for every program the driver's end-of-round
# bench.py will compile (the restart wiped the cache; a cold driver bench
# risks blowing its 3000 s budget on fresh 1024^2 + tent-Mosaic compiles),
# (3) the revised on-device warp-VJP tests (the tent default's device
# evidence), (4) resolution-table + steep warms.
set -x
cd /root/repo
T() { timeout -k 15 1500 "$@"; }
PIV_RESIZE_HALF=pool T python bench.py --one 2 4 bfloat16 1024 > work/r5_pool_v2.log 2>&1
T python bench.py --one 2 4 bfloat16 1024 > work/r5_einsum_v2.log 2>&1
T python bench.py --one 1 4 bfloat16 1024 > work/r5_v1_warm.log 2>&1
T python bench.py --train > work/r5_train_warm.log 2>&1
PIV_TPU_TESTS=1 T python -m pytest tests/test_pallas_ondevice.py -m tpu -k "warp_vjp or tvjp" -q -p no:cacheprovider > work/r5_tpu_warpvjp2.log 2>&1
T python bench.py --one 1 8 bfloat16 512 > work/r5_warm_v1_512.log 2>&1
T python bench.py --one 2 8 bfloat16 512 > work/r5_warm_v2_512.log 2>&1
T python bench.py --one 1 16 bfloat16 256 > work/r5_warm_v1_256.log 2>&1
T python bench.py --one 2 16 bfloat16 256 > work/r5_warm_v2_256.log 2>&1
T python bench.py --steep > work/r5_steep_warm.log 2>&1
echo DONE
