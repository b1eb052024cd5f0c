#!/bin/bash
# Rolling-executor-loss certification (round 13).
#
# The multi-process standalone campaign (PLANS.md §cluster) proved the full
# gate green across 3 executor PROCESSES, with the honest caveat that no
# process ever DIED. This script closes that caveat: it runs graft.Verify
# through spark-submit against a local standalone cluster while a killer
# loop SIGKILLs a random live executor JVM every KILL_EVERY seconds.
# Surviving that requires the whole recovery stack the 100 TB posture
# claims: master-driven executor relaunch, shuffle-fetch failure -> stage
# resubmission, reliable FS checkpoints for the iterative loop drivers
# (SPARK_GRAFT_CKPT_DIR), RocksDB state-store reload from checkpoint for
# the streaming gates, and task re-execution for everything else. The gate
# then must be HASH-GREEN vs DuckDB (tools/check.py) — recovery that
# corrupts a single row fails loudly.
#
# Usage: tools/cluster_chaos.sh [sf_dir] [out_dir] [kill_every_sec]
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/vout_chaos}
KILL_EVERY=${3:-60}
SPARK_HOME=/opt/spark
CLASSES=/root/repo/target/scala-2.13/classes
CKPT=/tmp/graft_chaos_ckpt
LOG=/tmp/cluster_chaos
mkdir -p "$LOG"; rm -rf "$OUT" "$CKPT"; mkdir -p "$CKPT"

export SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOG_DIR="$LOG"
export SPARK_WORKER_DIR="$LOG/work"

echo "[chaos] starting master + 3 workers"
"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8090
for i in 1 2 3; do
  SPARK_WORKER_WEBUI_PORT=$((8090 + i)) SPARK_IDENT_STRING="w$i" \
    "$SPARK_HOME/sbin/start-worker.sh" spark://127.0.0.1:7077 \
    --cores 10 --memory 30g --webui-port $((8090 + i))
done
sleep 8

# Killer loop: every KILL_EVERY seconds SIGKILL one random live executor
# backend. Never touches the driver, master, or worker daemons — this is
# executor/node loss, not cluster-infrastructure loss.
(
  while true; do
    sleep "$KILL_EVERY"
    mapfile -t pids < <(pgrep -f CoarseGrainedExecutorBackend)
    n=${#pids[@]}
    if [ "$n" -gt 0 ]; then
      victim=${pids[$((RANDOM % n))]}
      echo "[chaos] $(date +%T) SIGKILL executor pid $victim (${n} live)"
      kill -9 "$victim" 2>/dev/null
    fi
  done
) & KILLER=$!
trap 'kill $KILLER 2>/dev/null; for i in 1 2 3; do SPARK_IDENT_STRING="w$i" "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1; done; "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1' EXIT

# spark-submit needs a primary resource; pack the compiled classes.
JAR=/tmp/graft_chaos.jar
(cd "$CLASSES" && jar cf "$JAR" .)

echo "[chaos] submitting graft.Verify ($SF -> $OUT), killing one executor every ${KILL_EVERY}s"
SPARK_GRAFT_CKPT_DIR="$CKPT" "$SPARK_HOME/bin/spark-submit" \
  --master spark://127.0.0.1:7077 \
  --class graft.Verify \
  --driver-memory 8g \
  --executor-memory 24g --executor-cores 10 \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --conf spark.stage.maxConsecutiveAttempts=8 \
  "$JAR" "$SF" "$OUT" > "$LOG/verify_chaos.log" 2>&1 || true
kill $KILLER 2>/dev/null
grep -cE "graft-chaos|Lost executor|FetchFail" "$LOG/verify_chaos.log" | xargs echo "[chaos] loss/retry log lines:"
grep -c "ok in" "$LOG/verify_chaos.log" | xargs echo "[chaos] queries ok:"

echo "[chaos] verify done; running DuckDB replica gate"
python3 /root/repo/tools/check.py "$OUT" "$SF" | tail -5
