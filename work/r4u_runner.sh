#!/bin/bash
# r4u: confirm the f32 feat-warp on-device test at the measured tolerance.
set -x
while kill -0 $(cat /tmp/r4t.pid) 2>/dev/null; do sleep 60; done
PIV_TPU_TESTS=1 timeout -k 15 1800 python -m pytest "tests/test_pallas_ondevice.py::test_planar_feat_warp_on_device" -q > work/pytest_tpu_fwarp.log 2>&1
date; echo "R4U FWARP DONE rc=$?"
