#!/bin/bash
# Round-15: st13 size-conditional broadcast A/B. With the 1 GB events
# threshold, sf10 (207 MB) stays on the broadcast plan and sf100
# (2.1 GB) now takes the shuffled anti-join; the sf100 broadcast
# baseline was 114.1 s in this round's earlier panel.
set -u
cd /root/repo
{
  echo "=== st13 sf10 (broadcast regime) ==="
  SPARK_DRIVER_MEM=24g tools/graft_java.sh graft.tools.StMetrics st13_stream_anti_join target/sf10 1 2>/dev/null | grep -E "TIMED|STATE"
  echo "=== st13 sf100 (shuffled regime) ==="
  SPARK_DRIVER_MEM=48g tools/graft_java.sh graft.tools.StMetrics st13_stream_anti_join target/sf100 1 2>/dev/null | grep -E "TIMED|STATE"
  echo ALLDONE
} > target/st13_ab_r15.log 2>&1
