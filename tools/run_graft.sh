#!/bin/bash
# Run a graft main class from a SNAPSHOT of the compiled classes, so
# sbt stays free for concurrent compilation. Usage:
#   tools/run_graft.sh snapshot          # refresh /tmp/graft_classes from target/
#   tools/run_graft.sh <MainClass> args...
set -e
SNAP=/tmp/graft_classes
if [ "$1" = snapshot ]; then
  rm -rf "$SNAP"; cp -r /root/repo/target/scala-2.13/classes "$SNAP"
  echo "snapshot refreshed: $SNAP"
  exit 0
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN=$1; shift
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" "$MAIN" "$@"
