#!/bin/bash
# Tiny chain-runner: wait for the r4 queue to EXIT, then exec the r4b queue.
# A missing/unreadable /tmp/r4q.pid means "keep waiting" (the r4 queue may
# not have started yet, or /tmp was cleared) — never race it for the TPU.
# Only a pidfile that exists AND whose process is gone releases the chain.
# (exec re-reads run_r4b_queue.sh at start time, so that script stays
# editable while this waits.)  Kill via /tmp/r4b_wait.pid.
echo $$ > /tmp/r4b_wait.pid
while :; do
  pid=$(cat /tmp/r4q.pid 2>/dev/null)
  if [ -n "$pid" ] && ! kill -0 "$pid" 2>/dev/null; then
    break
  fi
  sleep 300
done
exec bash /root/repo/scripts/run_r4b_queue.sh
