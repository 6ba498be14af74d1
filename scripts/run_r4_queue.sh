#!/bin/bash
# Round-4 queue — priority order per VERDICT r3 "Next round":
#   0. bench --full refresh FIRST (BENCH_r03 was rc=124; the round needs a
#      committed fresh sweep the moment the backend heals)
#   1. tier-1 recipe validation: one end-to-end TPU run per shipping
#      deflation recipe (p1W pW tW bN eN hZ) — VERDICT #1/#4
#   2. hY: 3-stage late BC-weight-raising helmholtz continuation — #3
#   3. hE1/hE2: fresh-seed hS-config arms for the ensemble-averaging test
#      (hS postmortem: post-correction remainder ~1.5e-4 is net noise; if
#      it decorrelates across seeds, averaging K=3 members cuts it ~sqrt(3))
#   4. hT2: wide helmholtz where the Pallas/MXU tier should win — #5
#   5. exploratory single-stage arms
# Wedge-aware: accuracy.py exits EX_TEMPFAIL(75) on a dead backend;
# re-probe + one retry per arm.  Kill via /tmp/r4q.pid only.
echo $$ > /tmp/r4q.pid
cd /root/repo
mkdir -p out/logs out/acc

probe_until_healthy() {
  until timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print('tpu ok', float((x @ x).sum()))
" 2>/dev/null | grep -q "tpu ok"; do
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
  for attempt in 1 2; do
    echo "=== $tag start $(date +%T) attempt $attempt ==="
    timeout "$tmo" python scripts/accuracy.py --tag "$tag" --quiet "$@" \
      > "out/logs/$tag.log" 2>&1
    rc=$?
    echo "=== $tag end $(date +%T) rc=$rc ==="
    if [ "$rc" -eq 75 ]; then
      echo "$tag hit a dead backend — re-probing before retry"
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

echo "probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- Tier 0: throughput refresh (the round's bench evidence) ----

timeout 3000 env TPINN_BENCH_PROBE_WAIT_SECS=300 \
  python bench.py --full > out/logs/bench_r4.json 2> out/logs/bench_r4.err
echo "R4 BENCH DONE rc=$? $(date +%T)"

# ---- Tier 1: shipping-recipe validation (deflation in-run) ----

run p1W 2400 --problem poisson_1d --stages "5x50:tanh" \
  --adam 6000 --lbfgs 5000 --lbfgs-rounds 2 --n-col 8000 --n-band 0 \
  --n-adaptive 1000 --n-bd 200 --lw0 1.0 --lbfgs-grid 2000 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run tW 3600 --problem heat_2d --stages "6x96:tanh" \
  --adam 20000 --lbfgs 12000 --lbfgs-rounds 3 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run pW 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run bN 2400 --problem burgers_1d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run eN 3600 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --deflation full --save-artifacts

echo "R4 TIER1 DONE $(date +%T)"

run hZ 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R4 HZ DONE $(date +%T)"

# ---- Tier 2: helmholtz pushes ----

run hY 10000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm,4x128:tanh:ff64:fs10:warm:lw1e-2:lr1e-4" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 30000 --lbfgs 12000 --stage2-mult 1.0 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R4 HY DONE $(date +%T)"

# ensemble-averaging members: exact hS config, fresh seeds (hS = 1234)
run hE1 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --seed 7 --save-artifacts

run hE2 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --seed 8 --save-artifacts

echo "R4 ENSEMBLE MEMBERS DONE $(date +%T)"

# ---- Tier 3: the wide arm where the MXU binds (Pallas tier case) ----

run hT2 9000 --problem helmholtz_2d \
  --stages "4x192:tanh:ff96:fs10,4x192:tanh:ff96:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --adam-engine kernel \
  --adam-precision default --save-artifacts

echo "R4 HT2 DONE $(date +%T)"

# ---- Tier 4: exploratory single-stage generalization ----

SS="--stages 6x96:tanh --adam 20000 --lbfgs 12000 --lbfgs-rounds 3
    --n-col 20000 --n-band 2000 --n-adaptive 6000 --n-bd 500 --lw0 1.0
    --lbfgs-grid 300 --lsq-polish auto --pad-features 3 --hard-bc
    --save-artifacts"

run pS 3600 --problem poisson_2d $SS --deflation full
run bS 3600 --problem burgers_1d $SS --deflation full
run tV 3600 --problem heat_2d $SS --adam-precision default --deflation full

echo "R4 QUEUE DONE $(date +%T)"
