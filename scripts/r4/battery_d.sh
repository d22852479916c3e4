#!/bin/bash
# Round-4 battery D: the natural-image artifact (reference-gallery corpus),
# CM serving latency, and the MoE payoff comparison.
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
stage natface 5400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/natface64.json --data zip \
  --zip-path data/celeba_ref64 --no-crop --device-cache \
  --ckpt-dir /tmp/r4/ck
stage natface_strip 1800 python -m ddpm_diffusion_model_tpu.cli strip \
  --config scripts/r4/natface64.json --ckpt /tmp/r4/ck/natface64_last \
  --ema --sampler ddim --steps 50 \
  --out docs/artifacts/r4/natface_strip.png
stage natface_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddpm \
  --config scripts/r4/natface64.json --ckpt /tmp/r4/ck/natface64_last \
  --ema --n 36 --out docs/artifacts/r4/natface_grid.png
stage natface_nn 1800 python scripts/r4/nn_panel.py \
  --ckpt /tmp/r4/ck/natface64_last --config scripts/r4/natface64.json
stage serve_lat 4800 python scripts/r4/serving_latency.py \
  --cm-ckpt /tmp/r4/cm6k --base-ckpt /tmp/r4/ck/cfg6_v_last \
  --config scripts/r4/cfg6_v.json
stage moe_payoff 5400 python scripts/r4/moe_payoff.py --steps 2500
echo "=== battery D done $(date +%T) ==="
