#!/bin/bash
# Round-15: t14 post-widen ladder (documentsWide token source) — the
# pre-widen sf100 pair measured 224-378 s at 4-5/32 scan threads.
set -u
cd /root/repo
run() {
  echo "=== $1 $2 expect=${3}GB ==="
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_EXPECT_SHUFFLE_GB=$3 \
    tools/graft_java.sh graft.tools.TimeSpill "$1" "target/$2" "$4" 2>/dev/null \
    | grep -E "TIMEDS|PREFLIGHT"
}
{
  run t14_tfidf sf100 16 2
  run t14_tfidf sf300 48 2
  echo ALLDONE
} > target/t14_widen_r15.log 2>&1
