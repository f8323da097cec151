#!/bin/bash
# Run graft.Bench (or any graft main, $MAIN) straight off the compiled
# classes with the same JVM flags the sbt fork uses — no sbt project lock,
# so a bench can run while tests compile/run in another sbt process.
# Usage: SPARK_GRAFT_BENCH_ONLY=q_a,q_b tools/run_bench_nolock.sh
set -e
cd "$(dirname "$0")/.."
MAIN="${MAIN:-graft.Bench}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
