#!/bin/bash
# Chained wave follow-up arms: fire after the r4s6 campaign drains.
# wvA measured 0.453 (plain tanh misses the 8pi time mode) — these test
# the three known fixes: marching (per-window frequency reduction +
# order-2 Cauchy handoff), sin activation, and both.
cd /root/repo
echo $$ > /tmp/r4s6b.pid
mkdir -p out/logs out/acc_cpu

while kill -0 "$(cat /tmp/r4s6.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done

run() {
  tag=$1; shift
  [ -f "out/acc_cpu/$tag.json" ] && { echo "skip $tag (exists)"; return; }
  echo "=== $tag start $(date +%T) ==="
  timeout 14400 python scripts/accuracy.py --tag "$tag" --quiet \
    --platform cpu --out-dir out/acc_cpu "$@" \
    > "out/logs/$tag.log" 2>&1
  echo "=== $tag end $(date +%T) rc=$? ==="
  [ -f "out/acc_cpu/$tag.json" ] && python -c "
import json; r=json.load(open('out/acc_cpu/$tag.json'))
print(r['tag'], r['problem'], 'rel_l2=%.3e' % r['rel_l2'],
      '%.0fs' % r['wall_secs'])"
}

# march-4: windows span t in [0, .25] each — the 8pi mode is one period
# per window; soft Cauchy IC handoff (u AND u_t), so n_bd > 0
run wvM4 --problem wave_1d --stages "5x64:tanh" --march 4 \
  --adam 4000 --lbfgs 2000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111

# sin activation, frequency-scaled first layer
run wvC --problem wave_1d --stages "5x64:sin" --scl1 10 --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111

echo "R4S6B DONE $(date +%T)"
