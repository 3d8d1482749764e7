#!/bin/bash
# 5 reps at 32 cores + 2 at 8 cores, fresh JVM each, driver methodology
cd /root/repo
for i in 1 2 3 4 5; do
  echo "=== rep$i cpus=32 ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | tail -1
done
for i in 1 2; do
  echo "=== rep$i cpus=8 ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 python bench.py 2>/dev/null | tail -1
done
