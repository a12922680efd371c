#!/bin/bash
# Run a graft main class against compiled classes + /opt/spark/jars without sbt.
# Usage: tools/runjava.sh [-XmxNNg] <mainClass> [args...]
set -e
MEM="-Xmx16g"
if [[ "$1" == -Xmx* ]]; then MEM="$1"; shift; fi
ADD=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD $MEM -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
