#!/bin/bash
# Direct-JVM tool runner (sbt-free): run_tool.sh <MainClass> [heap]
CLASS="$1"; HEAP="${2:-48g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# heartbeat/network hardening: a saturated local[32] box under long GC
# pauses can miss 10s heartbeats 60 times and self-destruct (seen r16)
exec java -Xmx$HEAP $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.heartbeatInterval=60s -Dspark.network.timeout=800s \
  -Dspark.executor.heartbeat.maxFailures=600 \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$CLASS"
