#!/bin/bash
# Round-3 queue K — consolidated, priority-ordered replacement for the
# E2->F->G->H->I->J chain.  Rationale: the backend has been wedged for
# ~5h; when it heals, the *recipe-validating* defect-correction arms
# (tW pW p1W eN bN hZ — the round-3 capability evidence) must land
# before the exploratory arms (hW hU pV bV pS bS tV hT2), which the old
# chain ran first.  One serial runner, wedge-aware: scripts/accuracy.py
# exits EX_TEMPFAIL(75) on a dead backend, and we re-probe + retry each
# arm once.
echo $$ > /tmp/r3qK.pid
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

# ---- Tier 1: defect-correction recipe validation (cached shapes) ----

run p1W 2400 --problem poisson_1d --stages "5x50:tanh" \
  --adam 6000 --lbfgs 5000 --lbfgs-rounds 2 --n-col 8000 --n-band 0 \
  --n-adaptive 1000 --n-bd 200 --lw0 1.0 --lbfgs-grid 2000 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run pW 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run tW 3600 --problem heat_2d --stages "6x96:tanh" \
  --adam 20000 --lbfgs 12000 --lbfgs-rounds 3 --n-col 20000 --n-band 2000 \
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

echo "R3 TIER1 DONE $(date +%T)"

run hZ 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R3 HZ DONE $(date +%T)"

# ---- Tier 2: throughput refresh on the healed backend ----

timeout 3600 env TPINN_BENCH_PROBE_WAIT_SECS=600 \
  python bench.py --full > out/logs/bench_r3K.json 2> out/logs/bench_r3K.err
echo "R3 BENCH DONE $(date +%T)"

# ---- Tier 2b: hY — the hQ-postmortem arm.  The helmholtz error FFT
#      sits on the resonance ring (near-null modes of Δ+k² the residual
#      barely weights); the targeted fix is a LATE BC-WEIGHT-RAISING
#      warm continuation stage (StageSpec.lw exists; never run).  Stage 1
#      k=10 curriculum at lw0=1e-4, stage 2 true k=20 warm, stage 3 warm
#      with lw0 raised 100x + a gentler restart lr, then LSQ polish +
#      soft-BC Chebyshev defect correction. ----

run hY 10000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm,4x128:tanh:ff64:fs10:warm:lw1e-2:lr1e-4" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 30000 --lbfgs 12000 --stage2-mult 1.0 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R3 HY DONE $(date +%T)"

# ---- Tier 3: exploratory arms (single-stage generalization, 2-stage
#      tanh,sin pairs, curriculum-deflation interplay, wide rerun) ----

SS="--stages 6x96:tanh --adam 20000 --lbfgs 12000 --lbfgs-rounds 3
    --n-col 20000 --n-band 2000 --n-adaptive 6000 --n-bd 500 --lw0 1.0
    --lbfgs-grid 300 --lsq-polish auto --pad-features 3 --hard-bc
    --save-artifacts"

run pS 3600 --problem poisson_2d $SS --deflation full

run bS 3600 --problem burgers_1d $SS --deflation full

run tV 3600 --problem heat_2d $SS --adam-precision default --deflation full

TWO="--adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000
     --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300
     --lsq-polish auto --pad-features 3 --hard-bc --save-artifacts
     --adam-precision default"

run pV 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" $TWO

run bV 2400 --problem burgers_1d --stages "5x64:tanh,5x64:sin" $TWO

echo "R3 TIER3A DONE $(date +%T)"

HCURR="--problem helmholtz_2d
  --stages 4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283
  --lsq-polish auto --pad-features 3 --save-artifacts"

run hW 9000 $HCURR \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --deflation auto

run hT2 9000 --problem helmholtz_2d \
  --stages "4x192:tanh:ff96:fs10,4x192:tanh:ff96:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --save-artifacts

echo "R3 QUEUEK DONE $(date +%T)"
