#!/bin/bash
# Tiny chain-runner: wait for the r4 queue to exit, then exec the r4b queue.
# (exec re-reads run_r4b_queue.sh at start time, so that script stays
# editable while this waits.)  Kill via /tmp/r4b_wait.pid.
echo $$ > /tmp/r4b_wait.pid
while kill -0 "$(cat /tmp/r4q.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
exec bash /root/repo/scripts/run_r4b_queue.sh
