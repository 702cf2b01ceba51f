#!/bin/bash
# with_watchdog.sh — stall watchdog for TPU-relay training runs.
#
#   tools/with_watchdog.sh IDLE_SECS DEADLINE_SECS LOGFILE CMD...
#
# Runs CMD with stdout/stderr appended to LOGFILE. If LOGFILE stops
# growing for IDLE_SECS, the process is killed (by exact PID, never by
# pattern) and CMD is relaunched. DEADLINE_SECS bounds total wall time.
#
# Rationale: the environment's relayed TPU occasionally hangs INSIDE a
# device call (r4: one stage-1 epoch took 8230s; r5: same, eating 69% of
# the phase budget). The hang never raises, so in-process recovery
# (ldm3d.train.loop.fit_with_recovery) cannot see it — the process must
# be killed from outside and relaunched. CMD must therefore be
# idempotent: ldm3d.cli.main's `--resume_ckpt -1` resumes the latest
# checkpoint if one exists and starts fresh otherwise.
set -u
IDLE=$1; DEADLINE=$2; LOG=$3; shift 3
START=$(date +%s)
ATTEMPT=0
while :; do
  ATTEMPT=$((ATTEMPT + 1))
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  LAST_SIZE=-1
  LAST_CHANGE=$(date +%s)
  RC=""
  while :; do
    sleep 20
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; RC=$?
      break
    fi
    NOW=$(date +%s)
    SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$SIZE" != "$LAST_SIZE" ]; then
      LAST_SIZE=$SIZE
      LAST_CHANGE=$NOW
    elif [ $((NOW - LAST_CHANGE)) -ge "$IDLE" ]; then
      echo "[watchdog] attempt $ATTEMPT stalled ${IDLE}s — killing $PID" \
        >> "$LOG"
      kill -TERM "$PID" 2>/dev/null; sleep 10
      kill -KILL "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      RC=stalled
      break
    fi
    if [ $((NOW - START)) -ge "$DEADLINE" ]; then
      echo "[watchdog] deadline ${DEADLINE}s reached — killing $PID" >> "$LOG"
      kill -TERM "$PID" 2>/dev/null; sleep 10
      kill -KILL "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      exit 124
    fi
  done
  [ "$RC" = "0" ] && exit 0
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$DEADLINE" ]; then exit 124; fi
  if [ "$ATTEMPT" -ge 6 ]; then
    echo "[watchdog] giving up after $ATTEMPT attempts (last rc=$RC)" \
      >> "$LOG"
    exit 1
  fi
  echo "[watchdog] relaunching (attempt $((ATTEMPT + 1)), last rc=$RC)" \
    >> "$LOG"
done
