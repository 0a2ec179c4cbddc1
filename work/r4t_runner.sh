#!/bin/bash
# r4t(2): re-run bench on an idle box once the CPU suite ends.
set -x
while kill -0 $(cat /tmp/pytest.pid) 2>/dev/null; do sleep 60; done
sleep 30
timeout -k 15 3600 python -u bench.py > work/bench_r4_final2.txt 2>&1
date; echo "R4T BENCH2 DONE"
