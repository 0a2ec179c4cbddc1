#!/usr/bin/env bash
# Round-3b on-device experiment battery. Run with:
#   nohup bash work/r3b_runner.sh > work/r3b_runner.log 2>&1 &
set -x
cd /root/repo
python -u work/prof_model.py 1024 4 1,2            2>&1 | tail -4
python -u work/prof_fwarp.py 4                     2>&1 | tail -12
python -u work/prof_corr.py 4                      2>&1 | tail -10
python -u work/prof_impls.py 1 4                   2>&1 | tail -8
python -u work/prof_impls.py 2 4                   2>&1 | tail -8
python -u work/prof_v2.py 2 4                      2>&1 | tail -16
python -u work/prof_xla_flags.py 1 4               2>&1 | tail -8
PIV_TPU_TESTS=1 python -m pytest tests -m tpu -q   2>&1 | tail -4
echo "RUNNER DONE"
