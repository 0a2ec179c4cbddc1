#!/usr/bin/env bash
# Round-4g battery: rerun of the r4e/r4f probes that died in the host restart.
# Sequential, each stage time-boxed. Launch:
#   nohup bash work/r4g_runner.sh > work/r4g_runner.log 2>&1 &
set -x
cd /root/repo

timeout -k 15 3600 python -u work/prof_impls.py 1 4 1024   > work/impls_r4g_v1.log 2>&1
timeout -k 15 3600 python -u work/prof_impls.py 2 4 1024   > work/impls_r4g_v2.log 2>&1
timeout -k 15 2400 python -u work/prof_netc.py 2 4 256,512,1024 > work/netc_v2.log 2>&1
timeout -k 15 1800 python -u work/prof_netc.py 1 4 256,512 > work/netc_v1.log 2>&1
timeout -k 15 2400 python -u work/prof_v2_batch.py 2 8,16 1024 > work/v2_batch.log 2>&1
timeout -k 15 2400 python -u work/prof_train_ablate.py     > work/train_ablate.log 2>&1
timeout -k 15 3600 python -u work/prof_copts.py v2 4       > work/copts_v2.log 2>&1
date
echo "R4G RUNNER DONE"
# appended while running (bash reads lazily; appends at EOF execute)
PIV_NO_WARP_BARRIER=1 timeout -k 15 2400 python -u work/prof_model.py 1024 4 1,2 > work/barrier_off.log 2>&1
date
echo "R4G APPENDED STAGES DONE"
timeout -k 15 1800 python -u work/prof_netc_alone.py 4 1024 > work/netc_alone.log 2>&1
timeout -k 15 900 python -u work/prof_trace_probe.py > work/trace_probe.log 2>&1
date
echo "R4G APPENDED-2 DONE"
timeout -k 15 2400 python -u work/prof_train_ablate.py > work/train_ablate_packed.log 2>&1
date
echo "R4G APPENDED-3 DONE"
timeout -k 15 2400 python -u work/prof_copts.py v2 4 rwb_fusion_off,rwb_off_vmem64M > work/copts_v2_combo.log 2>&1
timeout -k 15 3000 python -u work/prof_copts.py v1 4 baseline,rwb_fusion_off,vmem64M,rwb_off_vmem64M > work/copts_v1_rwb.log 2>&1
date
echo "R4G APPENDED-4 DONE"
timeout -k 15 1800 python -u work/prof_netc_alone.py 4 1024 > work/netc_alone2.log 2>&1
date
echo "R4G APPENDED-5 DONE"
timeout -k 15 2400 python -u work/prof_trace_model.py 1 4 1024 3 > work/trace_v1.log 2>&1
timeout -k 15 2400 python -u work/prof_trace_model.py 2 4 1024 3 > work/trace_v2.log 2>&1
date
echo "R4G APPENDED-6 DONE"
timeout -k 15 2400 python -u work/prof_trace_train.py > work/trace_train.log 2>&1
PIV_TPU_TESTS=1 timeout -k 15 3600 python -m pytest tests -m tpu -q > work/pytest_tpu_r4g.log 2>&1
timeout -k 15 3600 python -u bench.py > work/bench_r4g.log 2>&1
date
echo "R4G APPENDED-7 DONE"
timeout -k 15 1800 python -u work/prof_hlo_map.py 1 4 1024 > work/hlo_map_v1.log 2>&1
date
echo "R4G APPENDED-8 DONE"
timeout -k 15 1800 python -u work/prof_hlo_map.py 2 4 1024 fusion.17,fusion.142,fusion.137,fusion.73,fusion.72,fusion.16,fusion.15,copy.3545,copy.3514,copy.3544,copy.3513,pad_maximum_fusion.3 > work/hlo_map_v2.log 2>&1
date
echo "R4G APPENDED-9 DONE"
timeout -k 15 2400 python -u work/prof_gather2d.py 4 1024 64 > work/gather2d.log 2>&1
date
echo "R4G APPENDED-10 DONE"
