#!/bin/bash
# Round-15: run-to-run variance probe for fresh-JVM st entries whose
# code did NOT change this round — bounds the environmental component
# of the r14→r15 bench deltas on this box.
set -u
cd /root/repo
for i in 1 2; do
  echo "=== pass $i ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=8g \
  SPARK_GRAFT_BENCH_ONLY=st6_stream_dedup,st9_stream_stream_join,st15_stream_curation,st20_stream_semi_join \
    tools/graft_java.sh graft.Bench 2>/dev/null | grep '"metric"' \
    | python3 -c 'import json,sys; q=json.loads(sys.stdin.read())["queries"]; [print(k,v) for k,v in sorted(q.items())]'
done > target/stvar_r15.log 2>&1
echo ALLDONE >> target/stvar_r15.log
