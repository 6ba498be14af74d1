#!/bin/bash
# Round-4 follow-up queue (chained after run_r4_queue.sh by r4b_wait.sh):
#   1. nd1  — the shipped 3-D Poisson recipe, measured on TPU
#   2. hR1  — hZ config + the resonance-band TRAINING penalty
#              (TrainSpec.ring_weight; CPU A/B first, decisive test is k=20)
#   3. iV1  — inverse-mode validation on TPU (heat diffusivity via the CLI)
#   4. ensemble combine of hS+hE1+hE2 when the members exist
# Kill via /tmp/r4b.pid only.
echo $$ > /tmp/r4b.pid
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

echo "r4b: probing TPU backend ($(date +%T))..."
probe_until_healthy

# ---- 3-D Poisson shipped recipe on TPU ----
run nd1 3600 --problem poisson_3d --stages "5x64:tanh" \
  --adam 4000 --lbfgs 4000 --lbfgs-rounds 2 --lbfgs-grid 24 \
  --n-col 4000 --n-band 1000 --n-adaptive 1000 --n-bd 200 --lw0 1.0 \
  --grid 31 --lsq-polish auto --hard-bc --save-artifacts

# ---- L-shaped Laplace shipped recipe (non-box domain) on TPU ----
run ls1 2400 --problem lshape_laplace --stages "4x48:tanh" \
  --adam 6000 --lbfgs 6000 --n-col 2048 --n-band 512 \
  --n-adaptive 1024 --n-bd 128 --lw0 1.0 --grid 64 \
  --pad-features 3 --save-artifacts

# ---- ring-penalty helmholtz (hZ config + ring) ----
run hR1 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --ring-weight 0.5 --deflation full \
  --save-artifacts

# ---- Navier-Stokes system presets on TPU (capability evidence) ----
if [ ! -f out/kov_tpu/system.json ]; then
  echo "=== kv1 start $(date +%T) ==="
  timeout 3600 python -m tpinn system --name kovasznay \
    --adam 12000 --lbfgs 8000 --depth 5 --width 64 --n-col 8000 \
    --n-adaptive 2000 --n-bd 400 --out out/kov_tpu \
    > out/logs/kv1.log 2>&1
  echo "=== kv1 end rc=$? $(date +%T) ==="
fi
if [ ! -f out/tg_tpu/system.json ]; then
  echo "=== tg1 start $(date +%T) ==="
  timeout 3600 python -m tpinn system --name taylor_green \
    --adam 10000 --lbfgs 8000 --depth 5 --width 64 --n-col 8000 \
    --n-adaptive 2000 --n-bd 300 --out out/tg_tpu \
    > out/logs/tg1.log 2>&1
  echo "=== tg1 end rc=$? $(date +%T) ==="
fi

# ---- overlapping-patch helmholtz on TPU (FBPINN tier) ----
if [ ! -f out/hp_tpu/patched.json ]; then
  echo "=== hP1 start $(date +%T) ==="
  timeout 7200 python -m tpinn train --problem helmholtz_2d \
    --patches 6x6 --depth 3 --width 24 --adam 40000 --lbfgs 9000 \
    --n-col 20000 --n-band 2000 --n-adaptive 6000 --n-bd 2000 \
    --weight-f 1e-4 --out out/hp_tpu > out/logs/hP1.log 2>&1
  echo "=== hP1 end rc=$? $(date +%T) ==="
fi

# ---- inverse mode on TPU (capability evidence, not a gate) ----
if [ ! -f out/inverse_tpu/inverse.json ]; then
  echo "=== iV1 start $(date +%T) ==="
  timeout 2400 python -m tpinn invert --problem heat_2d \
    --equation "u_t - lam*u_xx" --param lam=0.3 --n-obs 200 \
    --adam 6000 --lbfgs 4000 --depth 4 --width 48 --n-col 8000 \
    --n-adaptive 2000 --n-bd 400 --out out/inverse_tpu \
    > out/logs/iV1.log 2>&1
  echo "=== iV1 end rc=$? $(date +%T) ==="
fi

# ---- ensemble combine (hS + hE1 + hE2) ----
if [ -f out/acc/hE1.json ] && [ -f out/acc/hE2.json ] \
   && [ ! -f out/ensemble_h3.json ]; then
  echo "=== ensemble combine start $(date +%T) ==="
  timeout 1800 python scripts/ensemble_avg.py --problem helmholtz_2d \
    --checkpoints out/acc/hS_artifacts/params_stage_2.npz \
                  out/acc/hE1_artifacts/params_stage_2.npz \
                  out/acc/hE2_artifacts/params_stage_2.npz \
    --mode full --weights lsq \
    > out/ensemble_h3.json 2> out/logs/ensemble_h3.err
  echo "=== ensemble combine end rc=$? $(date +%T) ==="
fi

# ---- c=30 convection: the decisive budget the CPU arms couldn't afford ----
# (cvD* at 24k CPU steps: plain 0.196, causal 0.265 — literature budget is
#  ~10x larger.  Three arms: plain control, causal front, c-curriculum.)
run cvT0 5400 --problem convection_1d --stages "4x64:tanh" \
  --adam 120000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --save-artifacts
run cvT20 5400 --problem convection_1d --stages "4x64:tanh" \
  --adam 120000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --causal-eps 20 --causal-bins 32 \
  --save-artifacts
run cvTM 7200 --problem convection_1d --stages "4x64:tanh" --march 8 \
  --adam 20000 --lbfgs 6000 --n-col 4096 --n-adaptive 1024 --n-bd 512 \
  --grid 101 --pad-features 3 --save-artifacts
run cvTc 5400 --problem convection_1d \
  --stages "4x64:tanh,4x64:tanh:warm,4x64:tanh:warm" \
  --stage-eq "1:u_t + 10*u_x" --stage-eq "2:u_t + 20*u_x" \
  --adam 40000 --lbfgs 8000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
  --grid 101 --hard-bc --pad-features 3 --save-artifacts

echo "R4B QUEUE DONE $(date +%T)"
