#!/bin/bash
# Watchdog for a running chip-queue bash (round5b_queue.sh etc.).
#
# Failure shape it targets (CLAUDE.md round 3/4, re-measured twice on
# 2026-08-20): the axon worker flaps every ~20-40 min; a client caught
# mid-dispatch HANGS forever while the worker itself recovers in
# minutes.  Measured refinements from the two round-5 hangs:
#   - a hung client is NOT perfectly silent: background threads tick
#     ~1 CPU tick per 10-25 min (one hang), and the 09:42 tf hang burned
#     ~30 ticks/300s — so tick thresholds alone either starve or
#     over-trigger.  "Silent" is now: the leg's stdout log FROZEN and
#     ticks under TICKS_MAX per check (see inline comment), falling back
#     to the old < 2-tick bar when stdout isn't a regular file.
#   - while the worker is DOWN the probe fails too, and the old policy
#     (kill only when the probe PASSES) never fired — both hangs needed
#     manual kills.  Mid-dispatch hangs never recover (r3 evidence), and
#     killing against a down worker is safe because every queue leg
#     re-enters wait_healthy before its retry.  So: after HARD_STRIKES
#     of dead silence the client is killed regardless of probe outcome.
#
# Kill policy:
#   (a) silent for STRIKES consecutive checks AND a fresh tiny-TPU probe
#       PASSES -> hung client on a healthy worker: kill now; or
#   (b) silent for HARD_STRIKES consecutive checks (probe irrelevant —
#       zero-tick silence that long is impossible for any legitimate
#       dispatch pattern: scan chunks <=60 s, remote compiles <=~300 s,
#       every return ticks the host) -> kill.
# Kills are BY EXACT PID only; PID discovery walks the process tree
# (queue bash -> timeout -> python); NO pattern matching anywhere.
#
# Usage: nohup bash benchmarks/queue_watchdog.sh <queue_bash_pid> \
#          >/tmp/r5/watchdog.log 2>&1 &
set -u
QPID="${1:?usage: queue_watchdog.sh <queue_bash_pid>}"
CHECK="${WATCHDOG_CHECK_SECS:-300}"
STRIKES="${WATCHDOG_STRIKES:-5}"        # 25 min silence + healthy probe
HARD_STRIKES="${WATCHDOG_HARD_STRIKES:-8}"  # 40 min silence, probe or not

log() { echo "[wd $(date -u +%H:%M:%S)] $*"; }

cpu_ticks() {  # utime+stime of pid $1, empty if gone
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null
}

leg_python_pid() {  # deepest python descendant of the queue bash
  local pid="$QPID" next
  for _ in 1 2 3 4 5; do
    next=$(ps --ppid "$pid" -o pid= 2>/dev/null | head -1 | tr -d ' ')
    [[ -z "$next" ]] && break
    pid="$next"
    local comm
    comm=$(ps -p "$pid" -o comm= 2>/dev/null)
    [[ "$comm" == python* ]] && { echo "$pid"; return 0; }
  done
  return 1
}

probe_ok() {
  timeout 180 python -c '
import jax, numpy as np
x = jax.numpy.ones((8, 8))
print(float(np.asarray(jax.jit(lambda a: (a @ a).sum())(x))))
' >/dev/null 2>&1
}

kill_leg() {
  kill "$1" 2>/dev/null
  sleep 10
  kill -0 "$1" 2>/dev/null && kill -9 "$1" 2>/dev/null
}

stdout_size() {  # bytes written to pid $1's stdout, if it's a regular file
  local f
  f=$(readlink "/proc/$1/fd/1" 2>/dev/null)
  [[ -f "$f" ]] && stat -c %s "$f" 2>/dev/null
}

# "Silent" (round-5 refinement, measured on the 09:42 tf hang): a hung
# client is not tick-dead — that one burned ~30 ticks/300s in background
# threads, sailing past the old `< 2` dead-silence bar, and only a
# manual kill recovered the leg.  The honest signal is OUTPUT: every leg
# writes stdout at least every ~2 min when alive (convergence eval rows,
# [metrics] lines) EXCEPT distill recording phases, which print nothing
# for 20+ min but burn thousands of ticks fetching chunks.  So: hung =
# stdout frozen AND ticks under TICKS_MAX (0.33/s — an order of
# magnitude below any active dispatch-fetch loop) for the strike window;
# clients whose stdout is not a regular file keep the old `< 2` bar.
TICKS_MAX="${WATCHDOG_TICKS_MAX:-100}"

last_pid="" last_ticks="" last_bytes="" strikes=0
log "watching queue pid $QPID (check=${CHECK}s strikes=$STRIKES hard=$HARD_STRIKES ticks_max=$TICKS_MAX)"
while kill -0 "$QPID" 2>/dev/null; do
  sleep "$CHECK"
  pid=$(leg_python_pid) || { last_pid=""; strikes=0; continue; }
  ticks=$(cpu_ticks "$pid")
  [[ -z "$ticks" ]] && { last_pid=""; strikes=0; continue; }
  bytes=$(stdout_size "$pid")
  silent=0
  if [[ "$pid" == "$last_pid" ]]; then
    if [[ -n "$bytes" && -n "$last_bytes" ]]; then
      (( bytes == last_bytes && ticks - last_ticks < TICKS_MAX )) && silent=1
    else
      (( ticks - last_ticks < 2 )) && silent=1
    fi
  fi
  if (( silent )); then
    strikes=$((strikes + 1))
    log "pid $pid silent (ticks=$ticks bytes=${bytes:-n/a}, strike $strikes/$STRIKES hard=$HARD_STRIKES)"
    if (( strikes >= HARD_STRIKES )); then
      log "KILL (hard): pid $pid dead-silent ${strikes}x${CHECK}s -> hung client (worker state irrelevant)"
      kill_leg "$pid"
      strikes=0; last_pid=""
    elif (( strikes >= STRIKES )); then
      if probe_ok; then
        log "KILL: pid $pid silent ${strikes}x${CHECK}s and chip probe passes -> hung client"
        kill_leg "$pid"
        strikes=0; last_pid=""
      else
        log "pid $pid silent but probe FAILS (worker down/busy) - hard kill at $HARD_STRIKES"
      fi
    fi
  else
    [[ "$pid" == "$last_pid" ]] || log "tracking new leg pid $pid"
    strikes=0
  fi
  last_pid="$pid"; last_ticks="$ticks"; last_bytes="$bytes"
done
log "queue pid $QPID exited; watchdog done"
