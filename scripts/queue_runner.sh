#!/bin/bash
# Fallback relauncher: waits for the currently-running queue process (PID $1) to
# exit, then keeps relaunching the (idempotent, multi-pass) queue script until
# runs/DEADLINE passes or runs/STOP exists. Guarantees the tail stages run even
# if the interactive session driving this round dies. Never overlaps TPU
# clients: it launches only after the previous queue process is gone.
# $2: queue script basename without .py (default round5).
cd /root/repo || exit 1
Q="${2:-round5}"
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
while :; do
  D=$(cat runs/DEADLINE 2>/dev/null | cut -d. -f1)
  NOW=$(date +%s)
  [ -n "$D" ] && [ "$NOW" -ge "$D" ] && break
  [ -f runs/STOP ] && break
  BLINDNO_DEADLINE="${D:-$((NOW + 3600))}" python "scripts/$Q.py" >> "runs/logs/$Q.log" 2>&1
  sleep 600
done
