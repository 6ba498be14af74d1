#!/bin/bash
# Round-3 queue E (v2 — relaunched before execution to put the deflation
# arm first).  Waits for queue D.
#   hW  helmholtz k-curriculum + polish + RESONANT DEFLATION — the
#       closed-form ring-mode removal (polish.resonant_deflation),
#       offline-validated 3.7x on hQ's fields; the run measures it live
#   pV  poisson_2d recipe + adam_precision=default — does the bf16-Adam
#       result (eM: best annulus of the build) generalize across families?
#   bV  burgers recipe + adam_precision=default — the nonlinear case
#   hU  helmholtz k-curriculum + polish + lr_min 1e-5 — the hP/hR
#       postmortem fix: unbounded plateau halving froze the long Adam
#       phases at lr ~1e-9
echo $$ > /tmp/r3qE.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUED DONE" out/logs/r3qD.log 2>/dev/null; do
  sleep 120
done

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

echo "R3 QUEUEE DONE"
