#!/bin/bash
# Round-4 session-7 queue — the backend finally healed; land the live
# evidence in VERDICT-r3 priority order, most-valuable-first so every
# completed arm is committable even if the session ends mid-queue:
#   0. quick bench refresh (committed side evidence; BENCH_r04 is the
#      driver's own run at round end — bench.py emits fast now)
#   1. tier-1 shipping-recipe validation, deflation in-run
#      (p1W tW bN pW eN) — VERDICT #1/#4
#   2. new-preset measurement arms (allen_cahn march, wave, kdv) so
#      their recipes ship measured expected_rel_l2, on TPU where the
#      s6 CPU campaign never got to run
#   3. r4b capability arms (poisson_3d, lshape, inverse) if time allows
# Kill via /tmp/r4s7.pid only.
echo $$ > /tmp/r4s7.pid
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

echo "r4s7: probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- Tier 0: quick throughput refresh ----
if [ ! -f out/logs/bench_r4s7.json ]; then
  timeout 900 env TPINN_BENCH_PROBE_WAIT_SECS=90 \
    python bench.py > out/logs/bench_r4s7.json 2> out/logs/bench_r4s7.err
  echo "R4S7 BENCH DONE rc=$? $(date +%T)"
fi

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

run bN 2400 --problem burgers_1d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run pW 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run eN 3600 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --deflation full --save-artifacts

echo "R4S7 TIER1 DONE $(date +%T)"

# ---- Tier 2: new-preset measurement (recipes ship measured numbers) ----

run acM4 1800 --problem allen_cahn --stages "4x64:tanh" --march 4 \
  --adam 6000 --lbfgs 3000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111 --save-artifacts

run wvA 1800 --problem wave_1d --stages "5x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111 --save-artifacts

run kdA 1800 --problem kdv_1d --stages "4x64:tanh" \
  --adam 8000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 256 --grid 111 --save-artifacts

run acP 1800 --problem allen_cahn --stages "4x64:tanh" \
  --adam 24000 --lbfgs 6000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111 --save-artifacts

echo "R4S7 TIER2 DONE $(date +%T)"

# ---- Tier 3: capability arms from the r4b queue ----

run nd1 3600 --problem poisson_3d --stages "5x64:tanh" \
  --adam 4000 --lbfgs 4000 --lbfgs-rounds 2 --lbfgs-grid 24 \
  --n-col 4000 --n-band 1000 --n-adaptive 1000 --n-bd 200 --lw0 1.0 \
  --grid 31 --lsq-polish auto --hard-bc --save-artifacts

run ls1 2400 --problem lshape_laplace --stages "4x48:tanh" \
  --adam 6000 --lbfgs 6000 --n-col 2048 --n-band 512 \
  --n-adaptive 1024 --n-bd 128 --lw0 1.0 --grid 64 \
  --pad-features 3 --save-artifacts

if [ ! -f out/inverse_tpu/inverse.json ]; then
  echo "=== iV1 start $(date +%T) ==="
  timeout 2400 python -m tpinn invert --problem heat_2d \
    --equation "u_t - lam*u_xx" --param lam=0.3 --n-obs 200 \
    --adam 6000 --lbfgs 4000 --depth 4 --width 48 --n-col 8000 \
    --n-adaptive 2000 --n-bd 400 --out out/inverse_tpu \
    > out/logs/iV1.log 2>&1
  echo "=== iV1 end rc=$? $(date +%T) ==="
fi

if [ ! -f out/kov_tpu/system.json ]; then
  echo "=== kv1 start $(date +%T) ==="
  timeout 3600 python -m tpinn system --name kovasznay \
    --adam 12000 --lbfgs 8000 --depth 5 --width 64 --n-col 8000 \
    --n-adaptive 2000 --n-bd 400 --out out/kov_tpu \
    > out/logs/kv1.log 2>&1
  echo "=== kv1 end rc=$? $(date +%T) ==="
fi

echo "R4S7 QUEUE DONE $(date +%T)"
