#!/bin/bash
# Round-3 queue 1 (VERDICT next-steps 1, 3, 4):
#   tL  heat_2d + residual_weight e^{+pi^2 t} (tJ-winning config otherwise)
#   eK  annulus flagship (eH config) under engine=kernel — Pallas tier on
#       the training path, wall/accuracy vs eH's engine=auto
#   hP  helmholtz 200k-step budget-scaling run (hN config, 2.5x adam)
#   hQ  helmholtz k-curriculum: stage 1 at k=10 (equation override), stage 2
#       warm-started continuation at the true k=20
echo $$ > /tmp/r3q1.pid
cd /root/repo
mkdir -p out/logs out/acc

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

run tL 2400 --problem heat_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 --n-adaptive 6000 \
  --n-bd 500 --lw0 1.0 --lbfgs-grid 300 --pad-features 3 --hard-bc \
  --residual-weight "exp(9.8696044*t)" --save-artifacts

run eK 2400 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --n-col 30000 --n-band 5000 --n-adaptive 10000 \
  --n-bd 500 --lw0 0.05 --lbfgs-grid 450 --lbfgs-rounds 3 --hard-bc \
  --engine kernel --save-artifacts

run hP 9000 --problem helmholtz_2d --stages "4x128:tanh:ff64:fs10" \
  --adam 200000 --lbfgs 12000 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --pad-features 3 --save-artifacts

run hQ 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --pad-features 3 --save-artifacts

echo "R3 QUEUE1 DONE"
