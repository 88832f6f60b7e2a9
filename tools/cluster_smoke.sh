#!/bin/bash
# Multi-JVM smoke test: run the full graft.Verify correctness gate on a
# local-cluster master (Spark's public test master that launches REAL
# separate executor JVMs on this box) and hash-check it against DuckDB.
#
# The single-JVM local[32] evidence base cannot catch accidental
# driver-JVM-state assumptions (static codec state, scratch-dir file
# moves, per-partition digest reuse); this can — executors here share
# NOTHING with the driver but the filesystem, like a real deployment.
#
# Usage: tools/cluster_smoke.sh [sfDir] [outDir]
#   default sfDir /root/testdata/sf0.01, outDir /tmp/verify_cluster
# Serialize with other sbt/Spark/DuckDB jobs (see memory notes).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_cluster}
export SPARK_HOME=/opt/spark
# the standalone Worker's command builder probes source-tree build dirs
# unless the Scala version is pinned ("Cannot find any build directories")
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[4,8,8192]'
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tail -3
python3 tools/check.py "$SF" "$OUT"
