#!/bin/bash
# Round-5 consolidation queue — land TPU evidence for every round-4
# capability (VERDICT r4 asks #1-#6), most-valuable-first so every
# completed arm is committable even if the session ends mid-queue:
#   0. bench refresh (temp+mv so a failed run never poisons the guard)
#   1. p1W / wvA / kdA / acP — the remaining tier-1 + new-preset arms
#      the r4s7 queue dropped to backend flaps
#   2. sch1 — schrodinger 2-field system (last unmeasured preset)
#   3. cvTM / cvT0 / cvT20 — convection TPU budgets (VERDICT #5)
#   4. hR1 — decisive helmholtz ring-penalty k=20 arm (VERDICT #3)
#   5. tg1 / hP1 / bsT — Taylor-Green, patched helmholtz, burgers_shock
#   6. hY — late BC-weight raising (expensive, last)
#
# Advisor-r4 fixes vs run_r4s7_queue.sh:
#   #1 bench writes to a temp file, mv'd into place only on rc=0 + valid
#      JSON — a timed-out bench no longer permanently skips re-runs;
#   #2 launch with `setsid bash scripts/run_r5_queue.sh`; kill the whole
#      group via `kill -- -$(cat /tmp/r5q.pid)` — the TERM trap below
#      also forwards to the in-flight child;
#   #3 the probe is tpinn.utils.backendprobe.probe_backend(require="tpu")
#      — same health definition as accuracy.py, and a silent CPU
#      fallback can no longer pass for a healthy accelerator;
#   #4 rc=124 (arm killed by its own timeout after a mid-run wedge) is
#      retried like rc=75, and arms get 3 attempts (p1W/wvA burned both
#      of their 2 against one flap window).
echo $$ > /tmp/r5q.pid
cd /root/repo
mkdir -p out/logs out/acc

child=
trap 'echo "r5q: TERM"; [ -n "$child" ] && kill "$child" 2>/dev/null; exit 143' TERM INT

# single TPU: wait politely for the round-4 queue to drain first
r4pid=$(cat /tmp/r4s7.pid 2>/dev/null)
while [ -n "$r4pid" ] && kill -0 "$r4pid" 2>/dev/null; do
  echo "waiting for r4s7 queue (pid $r4pid) $(date +%T)"
  sleep 180
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

# run_mod <donefile> <timeout> <log> <module args...>: non-accuracy.py arms
run_mod() {
  donefile=$1; tmo=$2; log=$3; shift 3
  if [ -f "$donefile" ]; then
    echo "=== $log already done, skipping ==="
    return
  fi
  for attempt in 1 2; do
    echo "=== $log start $(date +%T) attempt $attempt ==="
    timeout "$tmo" python "$@" > "out/logs/$log.log" 2>&1 &
    child=$!; wait "$child"; rc=$?; child=
    echo "=== $log end $(date +%T) rc=$rc ==="
    if [ "$rc" -eq 75 ] || [ "$rc" -eq 124 ]; then
      probe_until_healthy
      continue
    fi
    break
  done
}

echo "r5q: probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- Tier 0: bench refresh (advisor #1: temp + mv on success only) ----
if [ ! -f out/logs/bench_r5.json ]; then
  timeout 900 env TPINN_BENCH_PROBE_WAIT_SECS=90 \
    python bench.py > /tmp/bench_r5.tmp 2> out/logs/bench_r5.err
  rc=$?
  if [ "$rc" -eq 0 ] && python -c "
import json,sys
d=[json.loads(l) for l in open('/tmp/bench_r5.tmp') if l.strip()]
sys.exit(0 if d and d[-1].get('value',0)>0 else 1)"; then
    mv /tmp/bench_r5.tmp out/logs/bench_r5.json
    echo "R5 BENCH DONE $(date +%T)"
  else
    echo "R5 BENCH failed/zero rc=$rc — will retry next launch $(date +%T)"
  fi
fi

# ---- Tier 1: dropped arms ----

run p1W 2400 --problem poisson_1d --stages "5x50:tanh" \
  --adam 6000 --lbfgs 5000 --lbfgs-rounds 2 --n-col 8000 --n-band 0 \
  --n-adaptive 1000 --n-bd 200 --lw0 1.0 --lbfgs-grid 2000 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run wvA 1800 --problem wave_1d --stages "5x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111 --save-artifacts

run kdA 1800 --problem kdv_1d --stages "4x64:tanh" \
  --adam 8000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 256 --grid 111 --save-artifacts

run acP 1800 --problem allen_cahn --stages "4x64:tanh" \
  --adam 24000 --lbfgs 6000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111 --save-artifacts

# ---- Tier 2: schrodinger (the last unmeasured preset) ----
run_mod out/sch_tpu/system.json 5400 sch1 -m tpinn system \
  --name schrodinger --adam 20000 --lbfgs 8000 --depth 5 --width 96 \
  --n-col 8192 --n-adaptive 2048 --n-bd 512 --out out/sch_tpu

# ---- Tier 3: convection TPU budgets (VERDICT #5) ----
run cvTM 5400 --problem convection_1d --stages "4x64:tanh" --march 8 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts

run cvT0 5400 --problem convection_1d --stages "4x64:tanh" \
  --adam 120000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --save-artifacts

run cvT20 5400 --problem convection_1d --stages "4x64:tanh" \
  --adam 120000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --causal-eps 20 --causal-bins 32 \
  --save-artifacts

# ---- Tier 4: decisive helmholtz ring arm (VERDICT #3) ----
run hR1 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --ring-weight 0.5 --deflation full \
  --save-artifacts

# ---- Tier 5: remaining capability twins ----
run_mod out/tg_tpu/system.json 3600 tg1 -m tpinn system \
  --name taylor_green --adam 10000 --lbfgs 8000 --depth 5 --width 64 \
  --n-col 8000 --n-adaptive 2000 --n-bd 300 --out out/tg_tpu

run bsT 2400 --problem burgers_shock --stages "4x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 4096 --n-band 0 --n-adaptive 2048 \
  --n-bd 256 --grid 111 --save-artifacts

run_mod out/hp_tpu/patched.json 7200 hP1 -m tpinn train \
  --problem helmholtz_2d --patches 6x6 --depth 3 --width 24 \
  --adam 40000 --lbfgs 9000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 2000 --weight-f 1e-4 --out out/hp_tpu

# ---- Tier 6: expensive helmholtz 3-stage (only if time allows) ----
run hY 10000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm,4x128:tanh:ff64:fs10:warm:lw1e-2:lr1e-4" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 30000 --lbfgs 12000 --stage2-mult 1.0 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R5 QUEUE DONE $(date +%T)"
