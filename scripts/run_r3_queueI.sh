#!/bin/bash
# Round-3 queue I.  Waits for queue H.
#   bN  burgers bJ-winning 2-stage config + --deflation full — the
#       Newton–Galerkin nonlinear correction (offline on bJ's
#       checkpoint: 8.70e-6 -> 1.48e-6, 5.9x)
echo $$ > /tmp/r3qI.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEH DONE" out/logs/r3qH.log 2>/dev/null; do
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

run bN 2400 --problem burgers_1d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --deflation full \
  --save-artifacts

echo "R3 QUEUEI DONE"
