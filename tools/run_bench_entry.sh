#!/bin/bash
# Usage: run_bench_entry.sh <entry[,entry]> <cpus> <xmx> [outfile]
ENTRY="$1"; CPUS="${2:-32}"; XMX="${3:-8g}"; OUT="${4:-/dev/stdout}"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_BENCH_ONLY="$ENTRY" \
SPARK_GRAFT_BENCH_OUT="${BENCH_OUT:-target/bench_entry.json}" \
java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$XMX -XX:ReservedCodeCacheSize=512m -XX:+TieredCompilation \
  -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1 > "$OUT"
