#!/bin/bash
# Round-5 chained queue (fires after run_r5_queue.sh drains):
#   1. ui1 — lite-UI march + inverse sessions END-TO-END on the real
#      backend (VERDICT-r4 ask #6: the march composite artifact set had
#      never been produced by a TPU run)
#   2. eW128 / eW256 — the hT2-style wide arms (VERDICT-r4 ask #4):
#      annulus at width 128/256 with adam_engine=kernel +
#      adam_precision=default, where bench's width sweep says the MXU
#      finally binds; equal-ish wall vs eN decides whether a wide recipe
#      ships or the Pallas tier gets its honest retirement note
#   3. cvM6 / cvM12 — convection window-count knee at TPU budgets
#      (VERDICT-r4 ask #5; cvTM in r5q is the march-8 point)
#   4. bench --full refresh (details table for the Pareto study)
# Launch: setsid bash scripts/run_r5b_queue.sh; kill -- -$(cat /tmp/r5b.pid)
echo $$ > /tmp/r5b.pid
cd /root/repo
mkdir -p out/logs out/acc

child=
trap 'echo "r5b: TERM"; [ -n "$child" ] && kill "$child" 2>/dev/null; exit 143' TERM INT

r5pid=$(cat /tmp/r5q.pid 2>/dev/null)
while [ -n "$r5pid" ] && kill -0 "$r5pid" 2>/dev/null; do
  echo "waiting for r5 queue (pid $r5pid) $(date +%T)"
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

echo "r5b: probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- 1. lite-UI march + inverse sessions on hardware ----
if [ ! -f out/ui_tpu/ui_sessions.json ]; then
  for attempt in 1 2; do
    echo "=== ui1 start $(date +%T) attempt $attempt ==="
    timeout 4800 python scripts/ui_tpu_sessions.py --out out/ui_tpu \
      --adam 3000 --lbfgs 1000 --march 4 > out/logs/ui1.log 2>&1 &
    child=$!; wait "$child"; rc=$?; child=
    echo "=== ui1 end $(date +%T) rc=$rc ==="
    if [ "$rc" -eq 75 ] || [ "$rc" -eq 124 ]; then probe_until_healthy; continue; fi
    break
  done
fi

# ---- 2. wide-width engine Pareto arms (annulus, eN sampling) ----
run eW128 3600 --problem annulus_laplace --stages "6x128:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --adam-engine kernel --deflation full --save-artifacts

run eW256 4800 --problem annulus_laplace --stages "6x256:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --adam-engine kernel --deflation full --save-artifacts

# control: same widths on the default XLA engine, to separate the
# engine effect from the width effect
run eX128 3600 --problem annulus_laplace --stages "6x128:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --deflation full --save-artifacts

# ---- 3. convection window-count knee at TPU budgets ----
run cvM6 5400 --problem convection_1d --stages "4x64:tanh" --march 6 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts

run cvM12 5400 --problem convection_1d --stages "4x64:tanh" --march 12 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts

# ---- 4. bench --full refresh ----
if [ ! -f out/logs/bench_full_r5.json ]; then
  timeout 3600 env TPINN_BENCH_PROBE_WAIT_SECS=90 \
    python bench.py --full > /tmp/bench_full_r5.tmp 2> out/logs/bench_full_r5.err
  rc=$?
  if [ "$rc" -eq 0 ] && python -c "
import json,sys
d=[json.loads(l) for l in open('/tmp/bench_full_r5.tmp') if l.strip()]
sys.exit(0 if d and d[-1].get('value',0)>0 else 1)"; then
    mv /tmp/bench_full_r5.tmp out/logs/bench_full_r5.json
    echo "R5B BENCH FULL DONE $(date +%T)"
  else
    echo "R5B BENCH FULL failed/zero rc=$rc $(date +%T)"
  fi
fi

echo "R5B QUEUE DONE $(date +%T)"
