#!/bin/bash
# Round-4 session-6 CPU campaign: measured numbers for the new benchmark
# presets (allen_cahn / wave_1d / kdv_1d / schrodinger) so their recipes
# ship with real expected_rel_l2 instead of placeholders.  Sequential —
# one CPU core on this host; arms skip when their record already exists.
cd /root/repo
mkdir -p out/logs out/acc_cpu
echo $$ > /tmp/r4s6.pid

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

# wave: hard-BC t^2 bubble pins the full Cauchy data (u, u_t)
run wvA --problem wave_1d --stages "5x64:tanh" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111

# wave fallback: Fourier features for the 4pi/8pi modes
run wvB --problem wave_1d --stages "5x64:tanh:ff64:fs10" --hard-bc \
  --adam 10000 --lbfgs 5000 --n-col 8192 --n-band 0 --n-adaptive 2048 \
  --n-bd 0 --grid 111

# kdv: third-order dispersion through the nested-jvp path
run kdA --problem kdv_1d --stages "4x64:tanh" \
  --adam 8000 --lbfgs 4000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 256 --grid 111

# allen-cahn: 4-window marching (the stiff flagship for --march)
run acM4 --problem allen_cahn --stages "4x64:tanh" --march 4 \
  --adam 6000 --lbfgs 3000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111

# allen-cahn plain space-time control (the literature's canonical
# failure case; Adam-matched total budget to the march arm)
run acP --problem allen_cahn --stages "4x64:tanh" \
  --adam 24000 --lbfgs 6000 --n-col 4096 --n-band 0 --n-adaptive 1024 \
  --n-bd 512 --grid 111

# schrodinger (NLS, 2-field real system) via the system CLI
if [ ! -f out/acc_cpu/nlsA.json ]; then
  echo "=== nlsA start $(date +%T) ==="
  timeout 14400 python -m tpinn system --name schrodinger --platform cpu \
    --adam 10000 --lbfgs 5000 --n-col 8192 --n-adaptive 2048 --n-bd 512 \
    --depth 5 --width 64 --out out/acc_cpu/nlsA_ckpt \
    > out/logs/nlsA.log 2>&1
  rc=$?
  echo "=== nlsA end $(date +%T) rc=$rc ==="
  # the system CLI prints its JSON record on the last line of the log
  tail -1 out/logs/nlsA.log > out/acc_cpu/nlsA.json 2>/dev/null || true
  cat out/acc_cpu/nlsA.json
fi

echo "R4S6 CAMPAIGN DONE $(date +%T)"
