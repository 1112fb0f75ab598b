#!/bin/bash
# Run a graft main class directly against the sbt-compiled classes +
# /opt/spark/jars, bypassing sbt (no project-lock contention, no JVM
# startup tax from the sbt launcher). Mirrors build.sbt's javaOptions.
# usage: run_graft.sh <mainClass> [args...]
set -euo pipefail
CLS=$1; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$CLS" "$@"
