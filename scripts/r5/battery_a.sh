#!/bin/bash
# Round-5 battery A (VERDICT #3 + #2 prep): split-trained natface64s base,
# PD-4 + CM students distilled from it on the SAME train split, then the
# natural-face quality table + editing demos vs the held-out split.
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

# A1: the base run — 799 train faces (val-frac 0.1 of 888), 6000 steps,
# val loss (raw + EMA) every 50 epochs
stage natsplit 5400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r5/natface64s.json --data zip \
  --zip-path data/celeba_ref64 --no-crop --device-cache \
  --val-frac 0.1 --eval-every 50 --ckpt-dir /tmp/r5/ck

# A2: progressive distillation 64->4 on the train split
stage nat_pd 3600 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r5/natface64s.json --ckpt /tmp/r5/ck/natface64s_last \
  --ema --out /tmp/r5/natpd4 --data zip --zip-path data/celeba_ref64 \
  --no-crop --device-cache --val-frac 0.1 \
  --start-steps 64 --to-steps 4 --phase-updates 400

# A3: consistency distillation on the train split
stage nat_cm 4800 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r5/natface64s.json --ckpt /tmp/r5/ck/natface64s_last \
  --ema --mode consistency --out /tmp/r5/natcm --data zip \
  --zip-path data/celeba_ref64 --no-crop --device-cache --val-frac 0.1 \
  --ladder-steps 32 --phase-updates 3000

# A4: the quality table (6 sampler rows + anchors) + img2img/inpaint demos
stage nat_quality 7200 python scripts/r5/quality_natface.py \
  --ckpt /tmp/r5/ck/natface64s_last --config scripts/r5/natface64s.json \
  --pd-ckpt /tmp/r5/natpd4 --cm-ckpt /tmp/r5/natcm \
  --grid-dir docs/artifacts/r5 --out /tmp/r5/nat_nfe.jsonl

# A5: denoise strip from the split-trained base
stage nat_strip 1800 python -m ddpm_diffusion_model_tpu.cli strip \
  --config scripts/r5/natface64s.json --ckpt /tmp/r5/ck/natface64s_last \
  --ema --sampler ddim --steps 50 --out docs/artifacts/r5/natface_strip.png

echo "=== battery A done $(date +%T) ==="
