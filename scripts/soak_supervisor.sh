#!/bin/bash
# Supervisor for the 10^10-event soak (scripts/soak_1e9.py in 1e10 mode).
#
# Relaunches the soak process with SOAK_RESUME=1 until the final "probe"
# JSON appears in the log — covering both the deliberate clean exits
# (SOAK_EPOCHS_PER_PROC bounds JVM RSS growth over a multi-hour run) and
# any real crash (kernel OOM kill, ENOSPC). Every relaunch is a cold-JVM
# checkpoint-resume from the table's committed epoch watermark, so the
# run doubles as a repeated exactly-once resume drive at full scale.
#
# Usage:  bash scripts/soak_supervisor.sh /tmp/soak_1e10.log
set -u
LOG="${1:-/tmp/soak_1e10.log}"
export SOAK_DIR="${SOAK_DIR:-/dev/shm/soak_1e10}"
export SOAK_TBL="${SOAK_TBL:-/tmp/soak_1e10_tbl}"
export SOAK_EPOCHS="${SOAK_EPOCHS:-250}"
export SOAK_VACUUM_EVERY="${SOAK_VACUUM_EVERY:-10}"
export SOAK_EPOCHS_PER_PROC="${SOAK_EPOCHS_PER_PROC:-50}"
# SPARK_LOCAL_DIRS must be ONE dedicated directory (not Spark's
# comma-separated list form, and never a shared dir like /tmp): the
# supervisor wipes it between attempts. Refuse anything that doesn't look
# like a dedicated soak scratch dir so a misconfigured env can't delete
# unrelated files (ADVICE r5).
export SPARK_LOCAL_DIRS="${SPARK_LOCAL_DIRS:-/dev/shm/soak_local}"
case "$SPARK_LOCAL_DIRS" in
  *,*)
    echo "soak_supervisor: SPARK_LOCAL_DIRS must be a single directory (got a comma-separated list: $SPARK_LOCAL_DIRS)" >&2
    exit 2 ;;
  *soak*) ;;  # dedicated soak dir — wipeable
  *)
    echo "soak_supervisor: refusing to manage SPARK_LOCAL_DIRS=$SPARK_LOCAL_DIRS — it is wiped between attempts, so it must be a dedicated dir matching *soak* (e.g. /dev/shm/soak_local)" >&2
    exit 2 ;;
esac
mkdir -p "$SPARK_LOCAL_DIRS"
cd "$(dirname "$0")/.."

attempt=0
until grep -q '"probe"' "$LOG" 2>/dev/null; do
  attempt=$((attempt + 1))
  if [ "$attempt" -gt 40 ]; then
    echo '{"supervisor": "giving up after 40 attempts"}' >> "$LOG"
    exit 1
  fi
  if [ "$attempt" -gt 1 ] || [ -e "$SOAK_TBL/_snapshots" ]; then
    export SOAK_RESUME=1
  fi
  # Wipe the previous attempt's Spark local dirs: a killed JVM leaves its
  # blockmgr-*/spark-* shuffle dirs behind (ContextCleaner never ran), and
  # on tmpfs those dead files ARE resident RAM — 40 crash-looped attempts
  # accumulated 80 GiB here and turned one OOM kill into a permanent OOM
  # loop. Safe because exactly one soak JVM runs at a time.
  rm -rf "$SPARK_LOCAL_DIRS"
  mkdir -p "$SPARK_LOCAL_DIRS"
  echo "{\"supervisor_attempt\": $attempt, \"resume\": \"${SOAK_RESUME:-0}\"}" >> "$LOG"
  python scripts/soak_1e9.py >> "$LOG" 2>&1 || true
done
echo '{"supervisor": "done"}' >> "$LOG"
