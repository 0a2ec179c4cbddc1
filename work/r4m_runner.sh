#!/bin/bash
# r4m battery: train-step device bill (HLO-attributed) + batch scaling.
set -x
timeout -k 15 1800 python -u work/prof_train_bill.py > work/train_bill.log 2>&1
date; echo "R4M BILL DONE"
timeout -k 15 3000 python -u work/prof_train_batch.py > work/train_batch.log 2>&1
date; echo "R4M BATCH DONE"
