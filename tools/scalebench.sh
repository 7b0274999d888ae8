#!/bin/bash
# Run graft.ScalingBench legs against the ALREADY-COMPILED classes,
# bypassing sbt so concurrent source edits cannot contaminate a leg.
#   tools/scalebench.sh <cpus> <heap> <scale> <ef> <mode> [extra SPARK_GRAFT_* env via environment]
# Prints the single JSON result line to stdout.
set -u
CPUS=$1; HEAP=$2; SCALE=$3; EF=$4; MODE=$5
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
ADDOPENS=""
for p in $OPENS; do ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"; done
SPARK_GRAFT_CPUS=$CPUS java -Xmx$HEAP $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ScalingBench "$SCALE" "$EF" "$MODE" 2>/dev/null | grep '^{'
