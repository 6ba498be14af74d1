#!/bin/bash
# Round-3 queue J.  Waits for queue I.
#   hZ  helmholtz hS-winning config (k-curriculum + LSQ polish, 3.84e-4)
#       + --deflation full — the NEW soft-BC Chebyshev defect correction
#       (offline on hS's checkpoint: 3.85e-4 -> 1.56e-4, 2.46x)
echo $$ > /tmp/r3qJ.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEI DONE" out/logs/r3qI.log 2>/dev/null; do
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

run hZ 9000 --problem helmholtz_2d \
  --stages "4x128:tanh:ff64:fs10,4x128:tanh:ff64:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --deflation full --save-artifacts

echo "R3 QUEUEJ DONE"
