#!/bin/bash
# r4r: on-device kernel tests after the cheap-guard/prep changes.
set -x
while kill -0 $(cat /tmp/r4q.pid) 2>/dev/null; do sleep 60; done
PIV_TPU_TESTS=1 timeout -k 15 3600 python -m pytest tests -m tpu -q > work/pytest_tpu_r4r.log 2>&1
date; echo "R4R TPU TESTS DONE"
