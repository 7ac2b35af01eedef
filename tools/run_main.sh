#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes + the
# /opt/spark/jars unmanaged classpath, without going through sbt — so a
# long soak (StateBench/StreamBench/Scale) can run while sbt holds the
# project lock for tests. Mirrors build.sbt's fork settings (JDK 17
# add-opens, UTC session TZ, SPARK_DRIVER_MEM heap).
#   tools/run_main.sh graft.StateBench 10000000 10000000 64 4 tws
set -euo pipefail
cd "$(dirname "$0")/.."

main="$1"; shift
heap="${SPARK_DRIVER_MEM:-8g}"
opens=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
flags=()
for p in "${opens[@]}"; do flags+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  flags+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${flags[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx$heap" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$main" "$@"
