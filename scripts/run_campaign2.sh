#!/bin/bash
# Round-2 accuracy campaign (VERDICT next-steps 1-3).  Sequential: one TPU
# chip, never contended.  Results land in out/acc/<tag>.json, logs in
# out/logs/<tag>.log.
cd /root/repo
mkdir -p out/logs out/acc

run() {
  tag=$1; shift
  echo "=== $tag start $(date +%T) ==="
  timeout 7200 python scripts/accuracy.py --tag "$tag" --quiet "$@" \
    > "out/logs/$tag.log" 2>&1
  echo "=== $tag end $(date +%T) rc=$? ==="
  [ -f "out/acc/$tag.json" ] && python -c "
import json; r=json.load(open('out/acc/$tag.json'))
print(r['tag'], r['problem'], 'rel_l2=%.3e' % r['rel_l2'], r['wall_secs'], 's')"
}

# --- annulus: f32 grid L-BFGS + f64 polish on CPU (aliasing-free) ---------
run aA --problem annulus_laplace --stages "6x50:tanh,6x50:sin" \
  --adam 20000 --lbfgs 6000 --n-col 20000 --n-band 4000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 334 --lbfgs-dtype float64 --lbfgs-device cpu

run aB --problem annulus_laplace --stages "8x64:tanh" \
  --adam 30000 --lbfgs 6000 --n-col 20000 --n-band 4000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 334 --lbfgs-dtype float64 --lbfgs-device cpu

# --- helmholtz k=20: spectral-bias recipes --------------------------------
run hA --problem helmholtz_2d --stages "4x64:tanh:ff64:fs10" \
  --adam 30000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 200

run hB --problem helmholtz_2d --stages "4x64:sin:siren" --scl1 10 \
  --adam 30000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 200

# --- 2-D presets to <=1e-4 -------------------------------------------------
run p2 --problem poisson_2d --stages "6x64:tanh" \
  --adam 20000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 334 --lbfgs-dtype float64 --lbfgs-device cpu

run ht --problem heat_2d --stages "6x64:tanh" \
  --adam 20000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-grid 334 --lbfgs-dtype float64 --lbfgs-device cpu

run bg --problem burgers_1d --stages "6x50:tanh,6x50:sin" \
  --adam 20000 --lbfgs 6000 --n-col 20000 --n-band 2000 --n-adaptive 8000 \
  --n-bd 500 --lbfgs-dtype float64 --lbfgs-device cpu

echo "CAMPAIGN2 DONE"
