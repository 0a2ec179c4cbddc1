#!/bin/bash
# r4v: cache-warming bench pass (1200-s boxes) so the driver's end-of-round
# capture cache-hits the extras.
set -x
while kill -0 $(cat /tmp/r4u.pid) 2>/dev/null; do sleep 60; done
timeout -k 15 3600 python -u bench.py > work/bench_r4_final3.txt 2>&1
date; echo "R4V BENCH3 DONE"
