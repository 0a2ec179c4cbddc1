#!/bin/bash
set -x
cd /root/repo
export JAX_PLATFORMS=
timeout -k 15 3600 python -u work/prof_copts.py v1 4 "baseline,s2b_off,s2b_dots,s2b_after_spmd,rwb_off_vmem64M" > work/copts_s2b_v1.log 2>&1
date; echo "R4J S2B V1 DONE"
timeout -k 15 3600 python -u work/prof_copts.py v2 4 "baseline,s2b_off,s2b_dots,s2b_after_spmd,rwb_off_vmem64M" > work/copts_s2b_v2.log 2>&1
date; echo "R4J S2B V2 DONE"
