#!/bin/bash
# Round-3 queue 2 (waits for queue 1):
#   tM  heat_2d, sqrt residual weight e^{+pi^2 t / 2} (tL's full e^{+pi^2 t}
#       destabilized training: rel_l2 0.72)
#   eL  annulus eH config, adam_engine=kernel: Pallas tier on the Adam hot
#       loop, exact autodiff for L-BFGS (eK showed kernel-everywhere costs
#       accuracy at the quasi-Newton phase)
#   eM  annulus eH config, adam_precision=default: single-pass bf16 MXU
#       Adam phase, full-precision L-BFGS — the throughput lever's
#       accuracy check
#   bench --full: BENCH_r03 details (scaling, width, precision, engines)
echo $$ > /tmp/r3q2.pid
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

run tM 2400 --problem heat_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 --n-adaptive 6000 \
  --n-bd 500 --lw0 1.0 --lbfgs-grid 300 --pad-features 3 --hard-bc \
  --residual-weight "exp(4.9348022*t)" --save-artifacts

run eL 2400 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --n-col 30000 --n-band 5000 --n-adaptive 10000 \
  --n-bd 500 --lw0 0.05 --lbfgs-grid 450 --lbfgs-rounds 3 --hard-bc \
  --adam-engine kernel --save-artifacts

run eM 2400 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --n-col 30000 --n-band 5000 --n-adaptive 10000 \
  --n-bd 500 --lw0 0.05 --lbfgs-grid 450 --lbfgs-rounds 3 --hard-bc \
  --adam-precision default --save-artifacts

echo "=== bench --full start $(date +%T) ==="
timeout 5400 python bench.py --full > out/logs/bench_r3.log 2>&1
echo "=== bench --full end $(date +%T) rc=$? ==="
tail -2 out/logs/bench_r3.log

echo "R3 QUEUE2 DONE"
