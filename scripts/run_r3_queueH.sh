#!/bin/bash
# Round-3 queue H.  Waits for queue G.
#   eN   annulus eM-winning config (6x80 VP, bf16 Adam, 1.85e-6) +
#        --deflation full — the Galerkin sin x Fourier correction
#        (offline on eM's checkpoint: 1.86e-6 -> 1.87e-7, 9.9x)
#   hT2  wide helmholtz (4x192:ff96) rerun — the hT arm died at the
#        60s dispatch kill before adaptive chunk sizing (b887107)
echo $$ > /tmp/r3qH.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEG DONE" out/logs/r3qG.log 2>/dev/null; do
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

run eN 3600 --problem annulus_laplace --stages "6x80:tanh" \
  --adam 8000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 30000 --n-band 5000 \
  --n-adaptive 10000 --n-bd 500 --lw0 0.05 --lbfgs-grid 450 \
  --lsq-polish auto --hard-bc --adam-precision default \
  --deflation full --save-artifacts

run hT2 9000 --problem helmholtz_2d \
  --stages "4x192:tanh:ff96:fs10,4x192:tanh:ff96:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --save-artifacts

echo "R3 QUEUEH DONE"
