#!/bin/bash
# Fast runner for graft mains without sbt startup overhead.
# Usage: scripts/run_main.sh graft.Bench [args...]
# Env passes through (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY, ...).
set -u
CLASSES=/root/repo/target/scala-2.13/classes
SCALA_LIB=$(ls /root/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13.17/scala-library-2.13.17.jar 2>/dev/null | head -1)
if [ -z "${SCALA_LIB}" ]; then SCALA_LIB=$(find /root/.cache/coursier /root/.ivy2 -name "scala-library-2.13*.jar" 2>/dev/null | head -1); fi
CP="$CLASSES:/opt/spark/jars/*"
if [ -n "${SCALA_LIB}" ]; then CP="$CP:$SCALA_LIB"; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+ExplicitGCInvokesConcurrent \
  -cp "$CP" "$@"
