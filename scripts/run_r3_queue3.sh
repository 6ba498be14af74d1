#!/bin/bash
# Round-3 queue 3 (waits for queue 2):
#   tN  heat_2d under the full VP recipe that carried the other linear
#       presets (lbfgs_rounds x exact f64 last-layer LSQ polish): the tJ
#       error map is FLAT in t (~1.2e-5 abs everywhere), so time-weighted
#       residuals (tL/tM) attack the wrong axis — the fit needs a global
#       extra digit, which VP provided elsewhere (p1K 3.6e-8, eH 3.3e-6)
#   tO  same + longer quasi-Newton budget and finer deterministic grid
echo $$ > /tmp/r3q3.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUE2 DONE" out/logs/r3q2.log 2>/dev/null; do
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

run tN 2400 --problem heat_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 4000 --n-col 20000 --n-band 2000 --n-adaptive 6000 \
  --n-bd 500 --lw0 1.0 --lbfgs-grid 300 --lbfgs-rounds 3 --lsq-polish auto \
  --pad-features 3 --hard-bc --save-artifacts

run tO 3600 --problem heat_2d --stages "5x64:tanh,5x64:sin" \
  --adam 10000 --lbfgs 8000 --n-col 20000 --n-band 2000 --n-adaptive 6000 \
  --n-bd 500 --lw0 1.0 --lbfgs-grid 400 --lbfgs-rounds 3 --lsq-polish auto \
  --pad-features 3 --hard-bc --save-artifacts

echo "R3 QUEUE3 DONE"
