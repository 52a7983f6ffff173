#!/bin/bash
# A/B/A/B solo re-timing of the round-13 sf0.1 inflation suspects,
# alternating r12-HEAD (cf6bc11, built in /tmp/r12wt) and r13-HEAD
# (1f76601, /tmp/r13wt) classes in fresh JVMs on an otherwise idle
# machine — VERDICT r14 directive 4 (BISECT_r12.md doctrine). Each run is
# Bench's single-name in-process mode (same warmup + noop sink as the
# gate), so a persistent code regression shows as a persistent ratio and
# ambient/slice contamination shows as parity.
set -u
QUERIES="${QUERIES:-events_durbin_watson stats_cliffs stats_brunner_munzel curate_auc events_funnel events_friedman stream_kruskal events_logrank}"
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
    -Dlog4j2.configurationFile=file:/root/repo/conf/log4j2.properties \
    -cp "$1:/opt/spark/jars/*" graft.Bench "$2" 2>/dev/null \
    | grep -o "\"$2\":[0-9.]*" | head -1
}
for q in $QUERIES; do
  for i in $(seq "$REPS"); do
    echo "r12  $q rep$i $(run /tmp/r12wt/target/scala-2.13/classes "$q")"
    echo "r13  $q rep$i $(run /tmp/r13wt/target/scala-2.13/classes "$q")"
  done
done
