#!/bin/bash
# Helmholtz k=20 recipe matrix (VERDICT next-step 2: <=1e-2 rel-L2).
cd /root/repo
mkdir -p out/logs out/acc

run() {
  tag=$1; shift
  echo "=== $tag start $(date +%T) ==="
  timeout 3600 python scripts/accuracy.py --problem helmholtz_2d \
    --tag "$tag" --quiet "$@" > "out/logs/$tag.log" 2>&1
  rc=$?
  echo "=== $tag end $(date +%T) rc=$rc ==="
  [ -f "out/acc/$tag.json" ] && python -c "
import json; r=json.load(open('out/acc/$tag.json'))
print(r['tag'], 'rel_l2=%.3e' % r['rel_l2'], r['wall_secs'], 's')"
}

COMMON="--adam 30000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 --n-bd 500 --lbfgs-grid 200 --lsq-polish auto --engine generic"

# random Fourier features at the target frequency band (sin(20x): 10 rad
# in minmax feature space)
run hA --stages "4x64:tanh:ff64:fs10" $COMMON
# SIREN-style: sin first layer at high frequency scale
run hB --stages "4x64:sin:siren" --scl1 30 $COMMON
# wider + modified-MLP gating + features
run hC --stages "5x128:tanh:ff128:fs10:mod" $COMMON
# residual-weight balance: k^2=400 makes mean(f^2) dominate; downweight
run hD --stages "4x64:tanh:ff64:fs10" --lw0 1e-4 $COMMON

echo "HELMHOLTZ MATRIX DONE"
