#!/bin/bash
# Scaling-efficiency measurement: N vs 4N executors, interleaved repeats
# (the sandbox VM has noisy-neighbor variance up to 3x; adjacent pairs are
# the fairest estimator).
# Usage: tools/run_scaling.sh [nDocs] [repeats] [coresPerExec]
#   coresPerExec=1 is the representative ladder (stays under the single
#   host's memory-bandwidth ceiling; see BENCH/BASELINE.md §1).
set -u
DOCS=${1:-2000000}
REPS=${2:-3}
CORES=${3:-1}
JAR=/root/repo/target/scala-2.13/groongaspark_2.13-0.1.0.jar
export SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark SPARK_GRAFT_EXEC_MB=12288
export SPARK_GRAFT_JAR=$JAR SPARK_GRAFT_BENCH_DIR=/dev/shm/graft
export SPARK_LOCAL_DIRS=/dev/shm/graft-local SPARK_DRIVER_MEM=8g
cd /root/repo
for i in $(seq 1 "$REPS"); do
  for execs in 1 4; do
    cpus=$((execs * CORES))
    rm -rf /dev/shm/graft/scale-idx-* /dev/shm/graft-local/*
    SPARK_GRAFT_EXECUTORS=$execs timeout 900 sbt -batch \
      "runMain graft.ScalingBench $DOCS $cpus" 2>&1 |
      grep -h scaling_level | sed "s/^/rep$i execs=$execs cores=$CORES /"
  done
done
