#!/bin/bash
# Round-4 TPU battery C: the natural-image overfit run (VERDICT #4), the
# MoE-vs-dense payoff comparison (#7), and CM serving latency (#6; needs
# battery A's checkpoints).
set -u
cd /root/repo
mkdir -p /tmp/r4/logs docs/artifacts/r4
L=/tmp/r4/logs

stage() {
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) stage $name ==="
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  echo "=== $(date +%T) stage $name rc=$?  ==="
}

# C1: first natural-image learning artifact — deliberately overfit the 40
# real face crops in data/celeba_zip through the REAL path
# (zip -> materialize_corpus -> DeviceCacheLoader -> v5e)
stage overfit 5400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/celeba40_overfit.json --data zip \
  --zip-path data/celeba_zip --device-cache --ckpt-dir /tmp/r4/ck \
  --eval-every 250 --log-every 0
stage overfit_strip 1800 python -m ddpm_diffusion_model_tpu.cli strip \
  --config scripts/r4/celeba40_overfit.json \
  --ckpt /tmp/r4/ck/celeba40_overfit_last --ema --sampler ddim --steps 50 \
  --out docs/artifacts/r4/celeba40_strip.png
stage overfit_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddpm \
  --config scripts/r4/celeba40_overfit.json \
  --ckpt /tmp/r4/ck/celeba40_overfit_last --ema --n 36 \
  --out docs/artifacts/r4/celeba40_grid.png

# C2: MoE payoff — dense DiT-S/4 vs MoE-DiT-S/4, matched steps (30 epochs x
# 12800 blobs) and a wall-clock-matched dense run (48 epochs ~= the MoE's
# 30-epoch wall time at the measured 1510-vs-951 imgs/s)
stage moe30 3600 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/dit_moe.json --data blobs --synthetic-size 12800 \
  --device-cache --ckpt-dir /tmp/r4/ck --no-samples
stage dense30 3600 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/dit_dense.json --data blobs --synthetic-size 12800 \
  --device-cache --ckpt-dir /tmp/r4/ck --no-samples
stage dense48 4800 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/dit_dense48.json --data blobs --synthetic-size 12800 \
  --device-cache --ckpt-dir /tmp/r4/ck --no-samples
stage eval_moe30 1800 python -m ddpm_diffusion_model_tpu.cli eval \
  --config scripts/r4/dit_moe.json --ckpt /tmp/r4/ck/r4_dit_moe_last --ema \
  --data blobs --rfid-n 36
stage eval_dense30 1800 python -m ddpm_diffusion_model_tpu.cli eval \
  --config scripts/r4/dit_dense.json --ckpt /tmp/r4/ck/r4_dit_dense_last \
  --ema --data blobs --rfid-n 36
stage eval_dense48 1800 python -m ddpm_diffusion_model_tpu.cli eval \
  --config scripts/r4/dit_dense48.json \
  --ckpt /tmp/r4/ck/r4_dit_dense48_last --ema --data blobs --rfid-n 36

# C3: CM 1-NFE serving latency vs DDIM-10 (needs battery A checkpoints)
stage serve_lat 4800 python scripts/r4/serving_latency.py \
  --cm-ckpt /tmp/r4/cm --base-ckpt /tmp/r4/ck/cfg6_v_last \
  --config scripts/r4/cfg6_v.json

echo "=== battery C done $(date +%T) ==="
