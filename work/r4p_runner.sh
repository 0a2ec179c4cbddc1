#!/bin/bash
# r4p: v1 batch-8 probe (conv tiling wants b>=8; half-split warps bound HBM).
set -x
while kill -0 $(cat /tmp/r4o.pid) 2>/dev/null; do sleep 60; done
timeout -k 15 2400 python -u work/prof_impls.py 1 8 1024 pad > work/impls_b8_v1.log 2>&1
date; echo "R4P B8 V1 DONE"
