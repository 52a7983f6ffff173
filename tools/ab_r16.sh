#!/bin/bash
# A/B/A/B solo re-timing of round-16 optimization targets at sf0.1,
# alternating the round-15 classes (a pre-round worktree build) and HEAD
# classes in fresh JVMs — the round-11/13 bisect methodology. Each run is
# Bench's in-process mode (same warmup + noop sink as the gate); the
# alternation means both sides sample the same ambient-load process.
#   R15_CLASSES=/tmp/r15base/target/scala-2.13/classes QUERIES="..." tools/ab_r16.sh
set -u
QUERIES="${QUERIES:-events_rfm stream_dedup_index stream_survival stats_wasserstein sim_ann_pq text_lm_bigram}"
REPS="${REPS:-2}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
R15="${R15_CLASSES:-/tmp/r15base/target/scala-2.13/classes}"
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
    -Dlog4j2.configurationFile=file:/root/repo/conf/log4j2.properties \
    -cp "$1:/opt/spark/jars/*" graft.Bench "$2" 2>/dev/null \
    | grep -o "\"$2\":[0-9.]*" | head -1
}
for q in $QUERIES; do
  for i in $(seq "$REPS"); do
    echo "r15  $q rep$i $(run "$R15" "$q")"
    echo "head $q rep$i $(run /root/repo/target/scala-2.13/classes "$q")"
  done
done
