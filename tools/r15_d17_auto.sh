#!/bin/bash
# Round-15 (r14 verdict task 5): validate d17's MatrixMaxSources=16
# crossover with the probe's auto mode — both plans timed per S, the
# production picker's choice checked against the measured winner
# (DISAGREE past a 15% margin exits 3).
set -u
cd /root/repo
{
  SPARK_DRIVER_MEM=48g tools/graft_java.sh graft.tools.D17WideProbe \
    target/sf10 3 8,16,32,64 auto 2>/dev/null | grep -E "D17PROBE"
  echo "exit=$?"
  echo ALLDONE
} > target/d17_auto_r15.log 2>&1
