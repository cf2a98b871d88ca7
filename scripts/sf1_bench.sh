#!/bin/bash
# Rebuild the sf1-equivalent corpus and run the FULL registry bench on it.
set -e
cd /root/repo
python scripts/scaling_check.py 10 --only=__none__ 2>/tmp/sf1_build.log || true
ls /tmp/sfscale_x10/ >> /tmp/sf1_build.log
SPARK_GRAFT_SF_DIR=/tmp/sfscale_x10 SPARK_GRAFT_CPUS=32 python bench.py > /tmp/sf1_bench_raw.out 2>/tmp/sf1_bench.log
tail -1 /tmp/sf1_bench_raw.out
