#!/bin/bash
# Round-4 battery C2: continue the celeba_zip overfit run to 15k steps
# (1500 was mid-training: loss 0.066, samples still noise) and redo the
# artifacts from the converged checkpoint.
set -u
cd /root/repo
mkdir -p /tmp/r4/logs docs/artifacts/r4
L=/tmp/r4/logs
stage() {
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) stage $name ==="
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  echo "=== $(date +%T) stage $name rc=$? ==="
}
stage overfit2 7200 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/celeba40_overfit.json --data zip \
  --zip-path data/celeba_zip --device-cache --ckpt-dir /tmp/r4/ck \
  --resume auto --epochs 15000
stage overfit2_strip 1800 python -m ddpm_diffusion_model_tpu.cli strip \
  --config scripts/r4/celeba40_overfit.json \
  --ckpt /tmp/r4/ck/celeba40_overfit_last --ema --sampler ddim --steps 50 \
  --out docs/artifacts/r4/celeba40_strip.png
stage overfit2_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddpm \
  --config scripts/r4/celeba40_overfit.json \
  --ckpt /tmp/r4/ck/celeba40_overfit_last --ema --n 36 \
  --out docs/artifacts/r4/celeba40_grid.png
echo "=== battery C2 done $(date +%T) ==="
stage serve_lat 4800 python scripts/r4/serving_latency.py \
  --cm-ckpt /tmp/r4/cm6k --base-ckpt /tmp/r4/ck/cfg6_v_last \
  --config scripts/r4/cfg6_v.json
echo "=== battery C2+serve done $(date +%T) ==="
