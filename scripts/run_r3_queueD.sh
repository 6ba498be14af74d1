#!/bin/bash
# Round-3 queue D.  Waits for queue C.  Rationale (tP postmortem):
# heat's error is pure residual transfer (e_rms = r_rms/100 on tJ AND tP)
# and the residual is no longer in the last-layer span (polish cut the
# sampled objective 22x, rel-L2 unchanged) — so the lever is feature
# capacity + the VP alternation (lbfgs_rounds 3), which every heat arm so
# far omitted.  The annulus flagship went 1e-4 -> 3.3e-6 on exactly that
# recipe, and heat is linear too.
#   tR  heat tP config + 3x budget + VP rounds 3
#   tS  heat single-stage 6x96 VP recipe (the annulus-winner transplant)
#   hT  helmholtz wide arm: 4x192:ff96 k-curriculum + polish
echo $$ > /tmp/r3qD.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEC DONE" out/logs/r3qC.log 2>/dev/null; do
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

run tR 3600 --problem heat_2d --stages "5x64:tanh,5x64:sin:scl8" \
  --adam 30000 --lbfgs 8000 --lbfgs-rounds 3 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --save-artifacts

run tS 3600 --problem heat_2d --stages "6x96:tanh" \
  --adam 20000 --lbfgs 12000 --lbfgs-rounds 3 --n-col 20000 --n-band 2000 \
  --n-adaptive 6000 --n-bd 500 --lw0 1.0 --lbfgs-grid 300 \
  --lsq-polish auto --pad-features 3 --hard-bc --save-artifacts

run hT 9000 --problem helmholtz_2d \
  --stages "4x192:tanh:ff96:fs10,4x192:tanh:ff96:fs10:warm" \
  --stage-eq "1:u_xx + u_yy + 100*u + 100*sin(10*x)*sin(10*y)" \
  --adam 40000 --lbfgs 12000 --stage2-mult 1.5 --n-col 40000 --n-band 4000 \
  --n-adaptive 16000 --n-bd 4000 --lw0 1e-4 --lbfgs-grid 283 \
  --lsq-polish auto --pad-features 3 --save-artifacts

echo "R3 QUEUED DONE"
