#!/bin/bash
# r4n battery (after r4m): flat-optimizer train re-measure + bill, lastconv=pad in-model.
set -x
while kill -0 $(cat /tmp/r4m.pid) 2>/dev/null; do sleep 60; done
timeout -k 15 2400 python -u work/prof_train.py bf16 > work/train_r4n.log 2>&1
date; echo "R4N TRAIN DONE"
timeout -k 15 1800 python -u work/prof_train_bill.py > work/train_bill2.log 2>&1
date; echo "R4N BILL DONE"
timeout -k 15 2400 python -u work/prof_impls.py 2 4 1024 pad > work/impls_pad_v2.log 2>&1
date; echo "R4N PAD V2 DONE"
timeout -k 15 3000 python -u work/prof_impls.py 1 4 1024 pad > work/impls_pad_v1.log 2>&1
date; echo "R4N PAD V1 DONE"
