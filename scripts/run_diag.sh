#!/bin/bash
# Stage-1 diagnostics: isolate points-count and lbfgs-grid effects.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag start $(date +%T) ==="
  timeout 3600 python scripts/accuracy.py --problem annulus_laplace \
    --stages "6x50:tanh" --tag "$tag" "$@" 2>&1 | grep -E "stage|final|rel_l2|Loss" | tail -12
  echo "=== $tag end $(date +%T) ==="
}
# d1: round-1 scale (reference point)
run d1 --adam 8000 --lbfgs 3000 --n-col 3000 --n-band 1000 --n-adaptive 1000 --n-bd 100
# d2: big points, sampled L-BFGS
run d2 --adam 8000 --lbfgs 3000 --n-col 20000 --n-band 4000 --n-adaptive 8000 --n-bd 500
# d3: big points + grid L-BFGS
run d3 --adam 8000 --lbfgs 3000 --n-col 20000 --n-band 4000 --n-adaptive 8000 --n-bd 500 --lbfgs-grid 334
echo DIAG DONE
