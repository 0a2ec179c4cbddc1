#!/bin/bash
# r4q: final round-4 bench capture (headline + extras incl. train samples/s).
set -x
while kill -0 $(cat /tmp/r4p.pid) 2>/dev/null; do sleep 60; done
timeout -k 15 3600 python -u bench.py > work/bench_r4_final.txt 2>&1
date; echo "R4Q BENCH DONE"
