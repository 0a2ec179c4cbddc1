#!/bin/bash
# r4o: A/B the flat optimizer vs per-leaf under the separable-aug build.
set -x
while kill -0 $(cat /tmp/r4n.pid) 2>/dev/null; do sleep 60; done
PIV_FLAT_OPT=0 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/train_noflat.log 2>&1
date; echo "R4O NOFLAT DONE"
PIV_FLAT_OPT=1 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/train_flat.log 2>&1
date; echo "R4O FLAT DONE"
PIV_FLAT_OPT=1 PIV_AUG_RESAMPLE=gather timeout -k 15 1800 python -u work/prof_train.py bf16 > work/train_flat_gatheraug.log 2>&1
date; echo "R4O FLAT+GATHERAUG DONE"
PIV_FLAT_OPT=2 timeout -k 15 1800 python -u work/prof_train.py bf16 > work/train_flat2.log 2>&1
date; echo "R4O FLAT2 DONE"
