#!/bin/bash
# Round-15 driver-shape bench at sf0.1 (full-consume contract, fresh
# phase on) — pins the post-st13/t14 artifact with the new
# total_insuite/total_fresh provenance split. stderr tail kept for
# diagnosis.
set -u
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=8g \
  tools/graft_java.sh graft.Bench \
  > >(grep '"metric"' > target/bench_r15.log) \
  2> target/bench_r15.err
echo "exit=$? $(date -u +%H:%M:%S)" >> target/bench_r15.log
