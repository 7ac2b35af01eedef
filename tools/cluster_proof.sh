#!/usr/bin/env bash
# SCALE.md §4: the local-cluster proof. local[n] runs every exchange
# in-process; `local-cluster[4,8,8192]` boots 4 REAL executor JVMs
# (standalone workers under SPARK_HOME) so closures serialize for real,
# broadcasts ride the network transport, shuffles cross process
# boundaries, and each executor has its OWN heap — the regime SCALE.md
# §3 admitted was unproven on a single JVM. Usage:
#   tools/cluster_proof.sh            # Verify@sf0.01 oracle + hot-12 soak on /tmp/x10
#   tools/cluster_proof.sh verify     # oracle half only
#   tools/cluster_proof.sh scale DIR  # soak half only, against DIR
set -euo pipefail
cd "$(dirname "$0")/.."

half="${1:-all}"
scale_dir="${2:-/tmp/x10}"
out=$(mktemp -d /tmp/graft_cluster.XXXXXX)
trap 'rm -rf "$out"' EXIT

export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[4,8,8192]}"
# local-cluster's in-process ExecutorRunner builds each executor's
# launch command via WorkerCommandBuilder, whose getScalaVersion()
# probes $SPARK_HOME/launcher/target/scala-2.13 — a SOURCE-BUILD dir
# that binary distributions don't have — unless this env var is set
# (spark's own shell scripts set it via load-spark-env.sh; an
# sbt-launched driver doesn't). Without it every executor dies with
# "Cannot find any build directories."
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_EXEC_MEM="${SPARK_GRAFT_EXEC_MEM:-6g}"
# 32 shuffle partitions to match the 4×8 task slots (and the local[32]
# baseline numbers)
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "=== cluster proof: master=$SPARK_GRAFT_MASTER exec_mem=$SPARK_GRAFT_EXEC_MEM ==="

if [[ "$half" == "all" || "$half" == "verify" ]]; then
  echo "--- full-registry Verify at sf0.01, DuckDB oracle compare ---"
  if sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out/sf0.01" \
      2>&1 | grep -E '\[verify\].*failed'; then
    echo "CLUSTER PROOF FAIL: Verify errors"; exit 1
  fi
  python3 tools/check.py /root/testdata/sf0.01 "$out/sf0.01" | tail -3 \
    || { echo "CLUSTER PROOF FAIL: oracle mismatch"; exit 1; }
fi

if [[ "$half" == "all" || "$half" == "scale" ]]; then
  echo "--- hot-12 scale soak on $scale_dir ---"
  sbt -batch "runMain graft.Scale $scale_dir" 2>&1 \
    | grep -E '"query"|"metric"'
fi
echo "CLUSTER PROOF DONE"
