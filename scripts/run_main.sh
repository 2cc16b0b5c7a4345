#!/bin/bash
# Run a graft main class outside sbt (no build-server lock), with the
# same JDK17 add-opens and session flags build.sbt's fork uses.
# Usage: [GRAFT_CLASSES=<dir>] scripts/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES="${GRAFT_CLASSES:-target/scala-2.13/classes}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_EXTRA_OPTS: optional extra JVM flags (e.g. relaxed
# -Dspark.executor.heartbeatInterval for long local[32] sweeps where a
# saturated box can starve the in-process heartbeat loop).
exec java $OPENS ${GRAFT_EXTRA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
