#!/bin/bash
# Round-5 battery C (VERDICT #9 + #5 + #6 + #7), ordered so the cheapest
# broadly-demanded evidence lands first if the round runs out of wall:
#   C1  loop-vs-direct audit (attn / dit / moe families, one process)
#   C2  serving under load (8/32 concurrent clients; ddim/dpmpp/cm routes)
#   C3  flow-matching natface run + grid (hardware artifact for the family)
#   C4  latent family on natural faces: VAE -> latent denoiser -> decoded grid
#   C5  CM-1 gap: 12k-update CD student from the cfg6 blobs teacher, rescored
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

stage loop_audit 5400 python scripts/r5/loop_audit.py --steps 30 \
  --families attn,dit,moe --out /tmp/r5/loop_audit.jsonl

stage serving_load 7200 python scripts/r5/serving_load.py \
  --ckpt /tmp/r4/ck/cfg6_v_last --config scripts/r4/cfg6_v.json \
  --cm-ckpt /tmp/r4/cm6k --out /tmp/r5/serving_load.jsonl

stage natflow 5400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r5/natflow64.json --data zip \
  --zip-path data/celeba_ref64 --no-crop --device-cache \
  --val-frac 0.1 --eval-every 100 --ckpt-dir /tmp/r5/ck
stage natflow_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddim \
  --config scripts/r5/natflow64.json --ckpt /tmp/r5/ck/natflow64_last --ema \
  --n 36 --steps 50 --out docs/artifacts/r5/natface_flow_grid.png

stage natvae 5400 python -m ddpm_diffusion_model_tpu.cli train-vae \
  --out /tmp/r5/natvae --data zip --zip-path data/celeba_ref64 --no-crop \
  --img-size 64 --batch-size 64 --epochs 300 --latent-channels 4 \
  --channel-mults 1,2,2
stage natlat 5400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r5/natlat.json --data zip --zip-path data/celeba_ref64 \
  --no-crop --latent-vae /tmp/r5/natvae --ckpt-dir /tmp/r5/ck --no-samples
stage natlat_grid 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddim \
  --config scripts/r5/natlat.json --ckpt /tmp/r5/ck/natlat_last --ema \
  --vae /tmp/r5/natvae --n 36 --steps 50 \
  --out docs/artifacts/r5/natface_latent_grid.png

stage cm12k 9000 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r4/cfg6_v.json --ckpt /tmp/r4/ck/cfg6_v_last --ema \
  --mode consistency --out /tmp/r5/cm12k --data blobs --synthetic-size 2000 \
  --device-cache --ladder-steps 32 --phase-updates 12000 --guidance 3
stage cm12k_score 5400 python scripts/r4/quality_nfe.py \
  --ckpt /tmp/r4/ck/cfg6_v_last --config scripts/r4/cfg6_v.json \
  --cm-ckpt /tmp/r5/cm12k --skip-base --tag _12k \
  --grid-dir docs/artifacts/r5 --out /tmp/r5/nfe12k.jsonl

: # moved below
#echo "=== battery C done $(date +%T) ==="

# C6 (retry): the direct-256px grid that died behind the wedged tunnel in
# battery B
stage hq256_grid2 2400 python -m ddpm_diffusion_model_tpu.cli sample-ddim \
  --config scripts/r5/hq256nat.json --ckpt /tmp/r5/ck/hq256nat_last --ema \
  --n 16 --steps 50 --out docs/artifacts/r5/natface256_direct.png
echo "=== battery C+ done $(date +%T) ==="
