#!/bin/bash
# Round-4 TPU battery B: sync methodology, the open bench-matrix rows, the
# 256px DDIM re-roofline, and cascade-vs-direct (VERDICT r3 #2/#3/#5).
set -u
cd /root/repo
mkdir -p /tmp/r4/logs
L=/tmp/r4/logs

stage() {
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) stage $name ==="
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  echo "=== $(date +%T) stage $name rc=$? ==="
}

# B1: settle block_until_ready vs host-fetch (one experiment, both configs)
stage sync64 1800 python scripts/r4/sync_check.py --config attn --batches 16 32
stage sync256 3000 python scripts/r4/sync_check.py --config hq256 \
  --batches 8 16 --reps 2

# B2: 256px DDIM-50 re-roofline at batch 16/32/64 with the corrected sync,
# plus the dpmpp flagship-inference row (the "2.5x cheaper" claim, measured)
stage s256_b16 2400 python bench.py --mode sample --config hq256 --batch 16 \
  --sampler ddim
stage s256_b32 2400 python bench.py --mode sample --config hq256 --batch 32 \
  --sampler ddim
stage s256_b64 3000 python bench.py --mode sample --config hq256 --batch 64 \
  --sampler ddim --sample-reps 2
stage s256_dpmpp 2400 python bench.py --mode sample --config hq256 \
  --batch 16 --sampler dpmpp

# B3: 64px dpmpp row + DiT / MoE-DiT sampling rows
stage s64_dpmpp 1800 python bench.py --mode sample --config attn --sampler dpmpp
stage sdit 1800 python bench.py --mode sample --config dit --sampler ddim
stage sdit_dpmpp 1800 python bench.py --mode sample --config dit --sampler dpmpp
stage sdit_moe 1800 python bench.py --mode sample --config dit_moe --sampler ddim

# B4: latent train + sample rows (the LDM compute trade, quantified)
stage latent_train 1800 python bench.py --config latent --steps 20
stage latent_sample 1800 python bench.py --mode sample --config latent \
  --sampler ddim
stage latent_dpmpp 1800 python bench.py --mode sample --config latent \
  --sampler dpmpp

# B5: cascade vs direct 256 (end-to-end samples/s, SR sweep 50/20)
stage cascade 3600 python scripts/r4/bench_cascade.py --n 8 \
  --sr-steps 50 20 --reps 2

echo "=== battery B done $(date +%T) ==="
