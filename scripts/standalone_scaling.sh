#!/usr/bin/env bash
# Executor-count scaling experiment (SCALING.md §4): run the minhash
# dedup ScalingProbe on a LOCAL STANDALONE cluster — one 32-core
# worker, executor shape varied per submit (1x32, 2x16, 4x8) at a
# fixed 32-core / fixed-work total — so the shuffle-heavy stages run
# across separate executor JVMs with real block-manager transfers
# instead of local[n]'s in-process shortcuts.
#
# Usage: sbt package && bash scripts/standalone_scaling.sh
#   REPS=3 (repeats per shape, min is the signal on this noisy box)
#   MULT=8 (corpus replication, as SCALING.md §2)
#   NCPP=1 (spark.shuffle.io.numConnectionsPerPeer — the §4 A/B
#           showed 2.0-4.4x on the 2x16 shape at 8 vs the default 1)
# Appends one JSON line per run to .scaling_standalone.jsonl.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=$(ls target/scala-2.13/msgvectorsearchspark_2.13-*.jar | head -1)
OUT=.scaling_standalone.jsonl
export SPARK_HOME=/opt/spark
# keep all daemon state out of /opt/spark (not ours to write)
export SPARK_LOG_DIR=/tmp/spark-standalone/logs
export SPARK_PID_DIR=/tmp/spark-standalone/pids
export SPARK_WORKER_DIR=/tmp/spark-standalone/work
export SPARK_LOCAL_IP=127.0.0.1
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8090
"$SPARK_HOME/sbin/start-worker.sh" spark://127.0.0.1:7077 \
  --cores 32 --memory 80g --webui-port 8091
sleep 5

REPS=${REPS:-3}
MULT=${MULT:-8}
NCPP=${NCPP:-1}
# pass-major order (all shapes, then repeat) spaces a shape's repeats
# minutes apart so one noisy co-tenant window cannot poison all reps
for rep in $(seq 1 "$REPS"); do
  for shape in "32 64g" "16 30g" "8 15g"; do
    set -- $shape; EC=$1; EM=$2
    echo "== rep $rep exec_cores=$EC load=$(cut -d' ' -f1 /proc/loadavg) ==" >&2
    SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_MULT=$MULT \
    "$SPARK_HOME/bin/spark-submit" --master spark://127.0.0.1:7077 \
      --class graft.ScalingProbe --driver-memory 8g \
      --executor-cores "$EC" --executor-memory "$EM" \
      --conf spark.cores.max=32 --conf spark.ui.enabled=false \
      --conf spark.shuffle.io.numConnectionsPerPeer="$NCPP" \
      "$JAR" 2>/dev/null | grep '^{"metric"' \
      | sed "s/}$/,\"ncpp\":$NCPP}/" >> "$OUT" \
      || echo "RUN FAILED rep=$rep exec_cores=$EC" >&2
  done
done

"$SPARK_HOME/sbin/stop-worker.sh"
"$SPARK_HOME/sbin/stop-master.sh"
