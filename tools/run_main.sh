#!/usr/bin/env bash
# Run a graft tool main against the compiled classes WITHOUT sbt — the
# scale probes (MakeScaled / IterScale / Verify at 10x/100x) run for
# minutes-to-hours and must not hold the sbt project lock. Mirrors
# build.sbt's forked-JVM flags (JDK17 module opens, UTC, heap from
# SPARK_DRIVER_MEM).
#   tools/run_main.sh <MainClass> [args...]
set -euo pipefail
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
