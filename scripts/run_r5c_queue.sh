#!/bin/bash
# Round-5c queue (chained after run_r5b_queue.sh): the campaign arms the
# round-5 CPU exploration designed —
#   1. wvMT8 / wvMT4 — wave_1d time-marching at TPU budgets.  CPU ladder
#      (out/acc_cpu): plain 2.0, ff 1.06, sin 1.06 (8pi time mode
#      unrepresentable; hard lift carries O(100) residual); march4 0.46,
#      +lw0=0.01 0.40, 4x budget 0.131 with window-1 error 2.7e-2 —
#      budget-limited, march is the structural fix, ff-in-window hurts.
#   2. acM8 — allen_cahn march-8 at double-window budget (acM4 TPU
#      1.95e-2 vs plain acP 0.505; narrower windows won on convection)
#   3. cvTc — convection 3-stage c-curriculum control (r4b design)
# Kill: kill -- -$(cat /tmp/r5c.pid)
echo $$ > /tmp/r5c.pid
cd /root/repo
mkdir -p out/logs out/acc

child=
trap 'echo "r5c: TERM"; [ -n "$child" ] && kill "$child" 2>/dev/null; exit 143' TERM INT

prev=$(cat /tmp/r5b.pid 2>/dev/null)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do
  echo "waiting for r5b queue (pid $prev) $(date +%T)"
  sleep 300
done

probe_until_healthy() {
  until python -c "
from tpinn.utils.backendprobe import probe_backend
import sys
sys.exit(0 if probe_backend(timeout=240, require='tpu') else 1)"; do
    echo "backend still down $(date +%T)"
    sleep 240
  done
  echo "backend healthy $(date +%T)"
}

run() {
  tag=$1; tmo=$2; shift 2
  if [ -f "out/acc/$tag.json" ]; then
    echo "=== $tag already done, skipping ==="
    return
  fi
  for attempt in 1 2 3; do
    echo "=== $tag start $(date +%T) attempt $attempt ==="
    timeout "$tmo" python scripts/accuracy.py --tag "$tag" --quiet "$@" \
      > "out/logs/$tag.log" 2>&1 &
    child=$!; wait "$child"; rc=$?; child=
    echo "=== $tag end $(date +%T) rc=$rc ==="
    if [ "$rc" -eq 75 ] || [ "$rc" -eq 124 ]; then
      echo "$tag backend death (rc=$rc) — re-probing before retry"
      probe_until_healthy
      continue
    fi
    break
  done
  [ -f "out/acc/$tag.json" ] && python -c "
import json; r=json.load(open('out/acc/$tag.json'))
print(r['tag'], 'rel_l2=%.3e' % r['rel_l2'], r['wall_secs'], 's',
      'fell_back', r['fell_back'])"
}

echo "r5c: probing TPU backend ($(date +%T))..."
probe_until_healthy

run wvMT8 5400 --problem wave_1d --stages "4x64:tanh" --march 8 \
  --lw0 0.01 --adam 20000 --lbfgs 6000 --n-col 4096 --n-band 0 \
  --n-adaptive 1024 --n-bd 512 --grid 111 --pad-features 3 \
  --save-artifacts

run wvMT4 5400 --problem wave_1d --stages "4x64:tanh" --march 4 \
  --lw0 0.01 --adam 20000 --lbfgs 6000 --n-col 4096 --n-band 0 \
  --n-adaptive 1024 --n-bd 512 --grid 111 --pad-features 3 \
  --save-artifacts

run acM8 5400 --problem allen_cahn --stages "4x64:tanh" --march 8 \
  --adam 12000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111 --save-artifacts

run cvTc 5400 --problem convection_1d \
  --stages "4x64:tanh,4x64:tanh:warm,4x64:tanh:warm" \
  --stage-eq "1:u_t + 10*u_x" --stage-eq "2:u_t + 20*u_x" \
  --adam 40000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --save-artifacts

echo "R5C QUEUE DONE $(date +%T)"
