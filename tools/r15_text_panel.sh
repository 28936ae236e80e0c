#!/bin/bash
# Round-15 text-family decade panel (verdict task 6): t14/t17 at the
# intermediate SFs that fit this box's disk (sf300/sf200 docs-only dirs,
# ~39/~64 GB projected shuffle vs the DiskPreflight-measured free GB) so
# the family's decade table ends in exponents, not a DNF row.
set -u
cd /root/repo
run() { # entry dir expectGB reps
  echo "=== $1 $2 expect=${3}GB ==="
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_EXPECT_SHUFFLE_GB=$3 \
    tools/graft_java.sh graft.tools.TimeSpill "$1" "target/$2" "$4" 2>/dev/null \
    | grep -E "TIMEDS|PREFLIGHT"
}
{
  run t14_tfidf        sf100 13 2
  run t14_tfidf        sf300 39 2
  run t17_boilerplate  sf100 32 2
  run t17_boilerplate  sf200 64 2
  echo ALLDONE
} > target/text_panel_r15.log 2>&1
