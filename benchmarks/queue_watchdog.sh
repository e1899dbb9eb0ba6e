#!/bin/bash
# Watchdog for a running chip-queue bash (round5b_queue.sh etc.).
#
# Failure shape it targets (CLAUDE.md round 3/4, re-measured this round):
# the axon worker flaps every ~20-40 min; a client caught mid-dispatch
# HANGS forever with ZERO further CPU ticks while the worker itself
# recovers in minutes and answers fresh probes instantly.  The queue's
# per-leg `timeout` only bounds the loss at 1.7-2.8 h per attempt; this
# watchdog bounds it at ~CHECK*STRIKES minutes.
#
# Kill policy (conservative — a false kill burns one of a leg's 3
# attempts): the leg's python client is killed BY EXACT PID only when
#   (a) its cumulative CPU ticks are UNCHANGED across STRIKES consecutive
#       checks (a working client always ticks: recording chunks ~1.5 s,
#       scan chunks <=60 s, remote compiles <=~300 s between returns), AND
#   (b) an independent tiny TPU probe PASSES — i.e. the worker is up and
#       serving new connections, so "busy chip" (round-4 false-negative
#       gotcha) cannot explain the silence.
# If the probe fails the strike clock keeps counting but no kill happens:
# a down worker means the client may be in the recoverable
# wait-then-error path, and the queue's own timeout still bounds it.
#
# PID discovery walks the process tree (queue bash -> timeout -> python);
# NO pattern matching anywhere (pgrep -f matches our own argv).
#
# Usage: nohup bash benchmarks/queue_watchdog.sh <queue_bash_pid> \
#          >/tmp/r5/watchdog.log 2>&1 &
set -u
QPID="${1:?usage: queue_watchdog.sh <queue_bash_pid>}"
CHECK="${WATCHDOG_CHECK_SECS:-300}"
STRIKES="${WATCHDOG_STRIKES:-5}"   # 5 x 300 s = 25 min of total silence

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

last_pid="" last_ticks="" strikes=0
log "watching queue pid $QPID (check=${CHECK}s strikes=$STRIKES)"
while kill -0 "$QPID" 2>/dev/null; do
  sleep "$CHECK"
  pid=$(leg_python_pid) || { last_pid=""; strikes=0; continue; }
  ticks=$(cpu_ticks "$pid")
  [[ -z "$ticks" ]] && { last_pid=""; strikes=0; continue; }
  if [[ "$pid" == "$last_pid" && "$ticks" == "$last_ticks" ]]; then
    strikes=$((strikes + 1))
    log "pid $pid silent (ticks=$ticks, strike $strikes/$STRIKES)"
    if (( strikes >= STRIKES )); then
      if probe_ok; then
        log "KILL: pid $pid silent ${strikes}x${CHECK}s and chip probe passes -> hung client"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -0 "$pid" 2>/dev/null && kill -9 "$pid" 2>/dev/null
        strikes=0; last_pid=""
      else
        log "pid $pid silent but probe FAILS (worker down/busy) - not killing"
      fi
    fi
  else
    [[ "$pid" == "$last_pid" ]] || log "tracking new leg pid $pid"
    strikes=0
  fi
  last_pid="$pid"; last_ticks="$ticks"
done
log "queue pid $QPID exited; watchdog done"
