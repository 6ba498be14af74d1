#!/bin/bash
# Round-5d CONSOLIDATED queue — replaces r5q/r5b/r5c after the wvA/kdA
# postmortem: those arms were missing --pad-features 3 on plain-minmax
# (x,t) problems, so every attempt SIGILLed the remote fusion pass
# (out/logs/wvA.log: tpu_compile_helper exit SIGILL in
# xla::jellyfish::TpuPriorityFusionQueue — the round-2 bug class) and
# core-dumped the worker, masquerading as backend flaps all day.
# Arms skip when their evidence file exists, so this is idempotent over
# everything r5q/r5b/r5c already landed.
# Kill: kill -- -$(cat /tmp/r5d.pid)
echo $$ > /tmp/r5d.pid
cd /root/repo
mkdir -p out/logs out/acc

child=
trap 'echo "r5d: TERM"; [ -n "$child" ] && kill "$child" 2>/dev/null; exit 143' TERM INT

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

echo "r5d: probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- Tier 1: the SIGILL-fixed new-preset arms ----
run wvA 1800 --problem wave_1d --stages "5x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111 --pad-features 3 --save-artifacts

run kdA 1800 --problem kdv_1d --stages "4x64:tanh" \
  --adam 8000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 256 --grid 111 --pad-features 3 --save-artifacts

# ---- Tier 2: schrodinger (the last unmeasured preset) ----
run_mod out/sch_tpu/system.json 5400 sch1 -m tpinn system \
  --name schrodinger --adam 20000 --lbfgs 8000 --depth 5 --width 96 \
  --n-col 8192 --n-adaptive 2048 --n-bd 512 --out out/sch_tpu

# ---- Tier 3: wave march arms (the CPU campaign's designs) ----
run wvMT8 5400 --problem wave_1d --stages "4x64:tanh" --march 8 \
  --lw0 0.01 --adam 20000 --lbfgs 6000 --n-col 4096 --n-band 0 \
  --n-adaptive 1024 --n-bd 512 --grid 111 --pad-features 3 \
  --save-artifacts

run wvMT4 5400 --problem wave_1d --stages "4x64:tanh" --march 4 \
  --lw0 0.01 --adam 20000 --lbfgs 6000 --n-col 4096 --n-band 0 \
  --n-adaptive 1024 --n-bd 512 --grid 111 --pad-features 3 \
  --save-artifacts

# ---- Tier 4: convection TPU budgets ----
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

run cvTc 5400 --problem convection_1d \
  --stages "4x64:tanh,4x64:tanh:warm,4x64:tanh:warm" \
  --stage-eq "1:u_t + 10*u_x" --stage-eq "2:u_t + 20*u_x" \
  --adam 40000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --save-artifacts

# ---- Tier 5: allen_cahn march-8 refinement ----
run acM8 5400 --problem allen_cahn --stages "4x64:tanh" --march 8 \
  --adam 12000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111 --save-artifacts

# ---- Tier 6: decisive helmholtz ring arm ----
run hR1 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --ring-weight 0.5 --deflation full \
  --save-artifacts

# ---- Tier 7: UI sessions on hardware ----
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

# ---- Tier 8: wide-width engine Pareto ----
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

run eX128 3600 --problem annulus_laplace --stages "6x128:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --deflation full --save-artifacts

# ---- Tier 9: remaining capability twins ----
run_mod out/tg_tpu/system.json 3600 tg1 -m tpinn system \
  --name taylor_green --adam 10000 --lbfgs 8000 --depth 5 --width 64 \
  --n-col 8000 --n-adaptive 2000 --n-bd 300 --out out/tg_tpu

run bsT 2400 --problem burgers_shock --stages "4x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 4096 --n-band 0 --n-adaptive 2048 \
  --n-bd 256 --grid 111 --pad-features 3 --save-artifacts

run_mod out/hp_tpu/patched.json 7200 hP1 -m tpinn train \
  --problem helmholtz_2d --patches 6x6 --depth 3 --width 24 \
  --adam 40000 --lbfgs 9000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 2000 --weight-f 1e-4 --out out/hp_tpu

# ---- Tier 10: convection knee + expensive helmholtz + bench full ----
run cvM6 5400 --problem convection_1d --stages "4x64:tanh" --march 6 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts

run cvM12 5400 --problem convection_1d --stages "4x64:tanh" --march 12 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts

run hY 10000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm,4x128:tanh:ff64:fs10:warm:lw1e-2:lr1e-4" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 30000 --lbfgs 12000 --stage2-mult 1.0 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

if [ ! -f out/logs/bench_full_r5.json ]; then
  timeout 3600 env TPINN_BENCH_PROBE_WAIT_SECS=90 \
    python bench.py --full > /tmp/bench_full_r5.tmp 2> out/logs/bench_full_r5.err
  rc=$?
  if [ "$rc" -eq 0 ] && python -c "
import json,sys
d=[json.loads(l) for l in open('/tmp/bench_full_r5.tmp') if l.strip()]
sys.exit(0 if d and d[-1].get('value',0)>0 else 1)"; then
    mv /tmp/bench_full_r5.tmp out/logs/bench_full_r5.json
    echo "R5D BENCH FULL DONE $(date +%T)"
  else
    echo "R5D BENCH FULL failed/zero rc=$rc $(date +%T)"
  fi
fi

echo "R5D QUEUE DONE $(date +%T)"
