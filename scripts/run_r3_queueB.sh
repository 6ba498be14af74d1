#!/bin/bash
# Round-3 queue B (replaces queues 2/3, which omitted --lsq-polish auto —
# the flag every round-2 winning run used; hP's regression vs hN traced to
# exactly that omission).  Waits for queue 1 (hQ) to finish.
#   tM  heat, sqrt residual weight (the residual_weight measurement, arm 2)
#   tP  heat, stage-2 scl capped at 8: tJ's stage 2 auto-derived scl=106
#       and added NOTHING (e_rms 1.04e-5 -> 1.09e-5) while the error map
#       is low-frequency (top modes kx<=5) — the known auto-scl aliasing
#       trap; a small-scl correction stage should capture a smooth error
#   tQ  heat, stage-2 scl 16 (bracket the cap)
#   eL  annulus eH config + adam_engine=kernel (Pallas Adam, exact L-BFGS)
#   eM  annulus eH config + adam_precision=default (bf16 Adam, exact L-BFGS)
#   hR  helmholtz 200k-step budget run WITH polish (the corrected hP)
#   bench --full  (BENCH_r03 details: scaling, width, precision, engines)
echo $$ > /tmp/r3qB.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUE1 DONE" out/logs/r3q1.log 2>/dev/null; do
  sleep 60
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

HEAT="--problem heat_2d --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000
      --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300
      --lsq-polish auto --pad-features 3 --hard-bc --save-artifacts"

run tM 2400 $HEAT --stages "5x64:tanh,5x64:sin" \
  --residual-weight "exp(4.9348022*t)"

run tP 2400 $HEAT --stages "5x64:tanh,5x64:sin:scl8"

run tQ 2400 $HEAT --stages "5x64:tanh,5x64:sin:scl16"

ANN="--problem annulus_laplace --stages 6x80:tanh --adam 8000 --lbfgs 8000
     --n-col 30000 --n-band 5000 --n-adaptive 10000 --n-bd 500 --lw0 0.05
     --lbfgs-grid 450 --lbfgs-rounds 3 --lsq-polish auto --hard-bc
     --save-artifacts"

run eL 2400 $ANN --adam-engine kernel

run eM 2400 $ANN --adam-precision default

run hR 9000 --problem helmholtz_2d --stages "4x128:tanh:ff64:fs10" \
  --adam 200000 --lbfgs 12000 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --save-artifacts

echo "=== bench --full start $(date +%T) ==="
timeout 5400 python bench.py --full > out/logs/bench_r3.log 2>&1
echo "=== bench --full end $(date +%T) rc=$? ==="
tail -2 out/logs/bench_r3.log

echo "R3 QUEUEB DONE"
