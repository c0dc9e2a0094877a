#!/usr/bin/env bash
# Dev-only: run a graft main (graft.Verify / graft.Bench / graft.repl.SqlRepl)
# straight from target/scala-2.13/classes without going through sbt, so a
# bench or verify pass can run while sbt itself is busy (e.g. `sbt test`).
# Usage: tools/run_main.sh <mainClass> [args...]
# Env passes through (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, ...).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
# Spark 4 on JDK 17 needs the module opens spark-submit normally injects
# (org.apache.spark.launcher.JavaModuleOptions).
OPENS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)
# Pinned pre-touched heap: with a growable heap (-Xmx alone) G1
# uncommits regions after concurrent cycles and the next allocation
# burst page-faults tens of GB back in — measured on this box as
# random 50-250s full-process stalls at 80% kernel time (vmstat sys,
# JVM unresponsive to jstack, zero GC activity in -Xlog:gc). Medians
# can't reject a stall that hits 1 in 6 samples. -Xms=-Xmx stops the
# uncommit; AlwaysPreTouch moves the one-time page-zeroing cost to
# startup where it isn't timed. SPARK_GRAFT_HEAP overrides (bench
# uses the same knob).
HEAP="${SPARK_GRAFT_HEAP:-64g}"
# already pinned here — tell graft.Bench not to re-exec a second child
export SPARK_GRAFT_BENCH_PINNED=1
exec java "${OPENS[@]}" -Xms"$HEAP" -Xmx"$HEAP" -XX:+AlwaysPreTouch \
  -Dderby.stream.error.file=/tmp/derby.log \
  -cp "$CP" "$@"
