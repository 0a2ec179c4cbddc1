#!/bin/bash
# Round-5 battery D: intermediate batch sweep (v2 then v1). Waits for C.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r5c.pid)" 2>/dev/null; do sleep 20; done
timeout -k 15 3600 python -u work/prof_r5_batch.py 2 1024 > work/r5_batch_v2.log 2>&1
timeout -k 15 3600 python -u work/prof_r5_batch.py 1 1024 > work/r5_batch_v1.log 2>&1
echo DONE
