#!/usr/bin/env bash
# Round-4f battery: runs after r4e_runner exits.
#   nohup bash work/r4f_runner.sh <r4e_pid> > work/r4f_runner.log 2>&1 &
set -x
cd /root/repo

PREV="${1:-}"
if [ -n "$PREV" ]; then
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

timeout -k 15 3600 python -u work/prof_impls.py 1 4 1024 > work/impls_r4f_v1.log 2>&1
timeout -k 15 2400 python -u work/prof_train_ablate.py > work/train_ablate.log 2>&1
date
echo "R4F RUNNER DONE"
