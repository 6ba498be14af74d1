#!/bin/bash
# Round-3 queue E2 — recovery relaunch of queue E after the TPU worker
# wedged (hT's oversized dispatch hit the 60s kill and the backend went
# UNAVAILABLE; adaptive chunk sizing b887107 prevents recurrence).
# Probes the backend until it heals, then runs the lost E arms and
# writes queue E's completion marker so queues F/G/H cascade.
echo $$ > /tmp/r3qE2.pid
cd /root/repo
mkdir -p out/logs out/acc

echo "probing TPU backend ($(date +%T))..."
until timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print('tpu ok', float((x @ x).sum()))
" 2>/dev/null | grep -q "tpu ok"; do
  echo "backend still down $(date +%T)"
  sleep 240
done
echo "backend healthy $(date +%T)"

run() {
  tag=$1; tmo=$2; shift 2
  echo "=== $tag start $(date +%T) ==="
  timeout "$tmo" python scripts/accuracy.py --tag "$tag" --quiet "$@" \
    > "out/logs/$tag.log" 2>&1
  echo "=== $tag end $(date +%T) rc=$? ==="
  [ -f "out/acc/$tag.json" ] && python -c "
import json; r=json.load(open('out/acc/$tag.json'))
print(r['tag'], 'rel_l2=%.3e' % r['rel_l2'], r['wall_secs'], 's',
      'fell_back', r['fell_back'])"
}

HCURR="--problem helmholtz_2d
  --stages 4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283
  --lsq-polish auto --pad-features 3 --save-artifacts"

run hW 9000 $HCURR \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --deflation auto

TWO="--adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000
     --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300
     --lsq-polish auto --pad-features 3 --hard-bc --save-artifacts
     --adam-precision default"

run pV 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" $TWO

run bV 2400 --problem burgers_1d --stages "5x64:tanh,5x64:sin" $TWO

run hU 9000 $HCURR \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --lr-min 1e-5 --deflation auto

echo "R3 QUEUEE DONE" >> out/logs/r3qE.log
echo "R3 QUEUEE2 DONE"
