#!/bin/bash
set -x
cd /root/repo
export JAX_PLATFORMS=
timeout -k 15 2400 python -u work/prof_multistep.py > work/multistep.log 2>&1
date; echo "R4I MULTISTEP DONE"
timeout -k 15 2400 python -u work/prof_hlo_map.py 1 4 1024 "fusion.22,fusion.120,fusion.125,fusion.21,fusion.20,copy.5026,copy.5631,copy.5138,copy.5141,copy.5161,copy.5168,copy.5156,pad.359,pad.348,pad_maximum_fusion.4,pad_slice_fusion.19,fusion.367,fusion.256,cond.23.clone,multiply_reduce_fusion.5,select_bitcast_fusion" > work/hlo_map_v1.log 2>&1
date; echo "R4I HLOMAP V1 DONE"
timeout -k 15 2400 python -u work/prof_hlo_map.py 2 4 1024 "fusion.17,fusion.142,fusion.137,fusion.73,fusion.72,fusion.16,fusion.15,copy.3545,copy.3514,copy.3544,copy.3513,copy.4035,pad_maximum_fusion.3,fusion.602,fusion.607,pad_slice_fusion.15,copy.4566,copy.4147,cond.17.clone" > work/hlo_map_v2.log 2>&1
date; echo "R4I HLOMAP V2 DONE"
