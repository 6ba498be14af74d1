#!/bin/bash
# Round-3 queue G.  Waits for queue F.  tS generalization arms: the
# single-stage VP shape (6x96, rounds 3) beat every 2-stage heat arm at
# 1/3 the wall — does it transfer?
#   pS  poisson_2d single-stage 6x96 VP (pJ 2-stage: 8.1e-7)
#   bS  burgers single-stage 6x96 rounds 3 (nonlinear: polish auto-skips;
#       bJ 2-stage: 8.7e-6)
#   tV  heat tS recipe + adam_precision=default (bf16 validation on the
#       new heat recipe)
echo $$ > /tmp/r3qG.pid
cd /root/repo
mkdir -p out/logs out/acc

while ! grep -q "R3 QUEUEF DONE" out/logs/r3qF.log 2>/dev/null; do
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

SS="--stages 6x96:tanh --adam 20000 --lbfgs 12000 --lbfgs-rounds 3
    --n-col 20000 --n-band 2000 --n-adaptive 6000 --n-bd 500 --lw0 1.0
    --lbfgs-grid 300 --lsq-polish auto --pad-features 3 --hard-bc
    --save-artifacts"

run pS 3600 --problem poisson_2d $SS

run bS 3600 --problem burgers_1d $SS

run tV 3600 --problem heat_2d $SS --adam-precision default

echo "R3 QUEUEG DONE"
