#!/bin/bash
# Annulus accuracy matrix (round-2 experiment driver).  Runs sequentially so
# the single TPU chip is never contended.  Logs to out/logs/, results to
# out/acc/<tag>.json.
cd /root/repo
for exp in \
  "a1|6x50:tanh,6x50:sin|20000|6000|" \
  "a2|6x50:tanh,6x50:sin|20000|4500|--lbfgs-dtype float64" \
  "a3|8x64:tanh|30000|6000|--lbfgs-dtype float64" ; do
  IFS='|' read -r tag stages adam lbfgs extra <<< "$exp"
  echo "=== $tag start $(date +%T) ==="
  timeout 5400 python scripts/accuracy.py --problem annulus_laplace \
    --stages "$stages" --adam "$adam" --lbfgs "$lbfgs" \
    --n-col 20000 --n-band 4000 --n-adaptive 8000 --n-bd 500 \
    --lbfgs-grid 334 $extra --tag "$tag" --quiet 2>&1 | tail -3
  echo "=== $tag end $(date +%T) rc=$? ==="
done
echo "MATRIX DONE"
