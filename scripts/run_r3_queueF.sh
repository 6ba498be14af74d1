#!/bin/bash
# Round-3 queue F.  Waits for queue E.  The defect-correction arms:
#   tW   heat tS-winning config (single-stage 6x96 VP, 3.69e-5) +
#        --deflation full (parabolic Duhamel; offline 3.4x on tR fields)
#   pW   poisson_2d pJ config + --deflation full (elliptic full-band;
#        offline 6.8x on pJ fields)
#   p1W  poisson_1d p1K config + --deflation full (1-D elliptic)
echo $$ > /tmp/r3qF.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEE DONE" out/logs/r3qE.log 2>/dev/null; do
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

run tW 3600 --problem heat_2d --stages "6x96:tanh" \
  --adam 20000 --lbfgs 12000 --lbfgs-rounds 3 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run pW 2400 --problem poisson_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

run p1W 2400 --problem poisson_1d --stages "5x50:tanh" \
  --adam 6000 --lbfgs 5000 --lbfgs-rounds 2 --n-col 8000 --n-band 0 \
  --n-adaptive 1000 --n-bd 200 --lw0 1.0 --lbfgs-grid 2000 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

echo "R3 QUEUEF DONE"
