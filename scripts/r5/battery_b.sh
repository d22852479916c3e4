#!/bin/bash
# Round-5 battery B (VERDICT #2): the 256px natural-image deliverable.
#   B1  SR3 x4 upsampler trained self-supervised on the 256px ref-gallery
#       corpus (199 faces, data/celeba_ref256)
#   B2  two-stage cascade: natface64s base (64px DDIM-50) -> SR x4 -> 256px
#       photographic grid (+ the base grid for comparison)
#   B3  direct 256px train on the same corpus (overfit-scale, the
#       reference's flagship config shape)
#   B4  grids + denoise strip from the direct 256px run
set -u
cd /root/repo
mkdir -p /tmp/r5/logs docs/artifacts/r5
L=/tmp/r5/logs
stage() {
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) stage $name ==="
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  echo "=== $(date +%T) stage $name rc=$? ==="
}

stage sr256 7200 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r5/sr256nat.json --data zip \
  --zip-path data/celeba_ref256 --no-crop --device-cache \
  --ckpt-dir /tmp/r5/ck --no-samples

stage cascade 3600 python -m ddpm_diffusion_model_tpu.cli cascade \
  --config scripts/r5/sr256nat.json --ckpt /tmp/r5/ck/sr256nat_last --ema \
  --base-ckpt /tmp/r5/ck/natface64s_last \
  --base-config scripts/r5/natface64s.json \
  --n 16 --base-steps 50 --steps 50 \
  --out docs/artifacts/r5/natface256_cascade.png \
  --out-low docs/artifacts/r5/natface256_cascade_base64.png

stage hq256 7200 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r5/hq256nat.json --data zip \
  --zip-path data/celeba_ref256 --no-crop --device-cache \
  --ckpt-dir /tmp/r5/ck --no-samples

stage hq256_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddim \
  --config scripts/r5/hq256nat.json --ckpt /tmp/r5/ck/hq256nat_last --ema \
  --n 16 --steps 50 --out docs/artifacts/r5/natface256_direct.png

stage hq256_strip 2400 python -m ddpm_diffusion_model_tpu.cli strip \
  --config scripts/r5/hq256nat.json --ckpt /tmp/r5/ck/hq256nat_last --ema \
  --sampler ddim --steps 50 --out docs/artifacts/r5/natface256_strip.png

echo "=== battery B done $(date +%T) ==="
