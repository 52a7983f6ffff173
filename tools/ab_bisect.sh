#!/bin/bash
# A/B/A/B solo re-timing of the round-11 heavy-tail regression suspects at
# sf0.1, alternating the round-10 classes (.r10wt) and HEAD classes in fresh
# JVMs on an otherwise idle machine — VERDICT r11 directive 2. Each run is
# Bench's single-name in-process mode (same warmup + noop sink as the gate).
set -u
QUERIES="${QUERIES:-link_customers stream_components sim_ann_ivfpq stream_dedup_index}"
REPS="${REPS:-3}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # $1=classes dir  $2=query
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" graft.Bench "$2" 2>/dev/null \
    | grep -o "\"$2\":[0-9.]*" | head -1
}
for q in $QUERIES; do
  for i in $(seq "$REPS"); do
    echo "r10  $q rep$i $(run /root/repo/.r10wt/target/scala-2.13/classes "$q")"
    echo "head $q rep$i $(run /root/repo/target/scala-2.13/classes "$q")"
  done
done
