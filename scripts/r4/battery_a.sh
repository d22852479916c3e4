#!/bin/bash
# Round-4 TPU evidence battery A: the quality-vs-NFE program (VERDICT #1/#8).
# Strictly one TPU process at a time; every stage logged under /tmp/r4/logs.
# Budget notes: every program recompiles (persistent cache disabled on this
# host); stages get generous timeouts instead of kills (CLAUDE.md).
set -u
cd /root/repo
mkdir -p /tmp/r4/ck /tmp/r4/logs docs/artifacts/r4
L=/tmp/r4/logs

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) stage $name ==="
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "=== $(date +%T) stage $name rc=$rc ==="
  return $rc
}

# A1/A2: the 6-class CFG blob checkpoints (v-pred for distillation, eps for
# the bits/dim pair) — the r3 recipe: 2k labeled corpus, batch 192, device
# cache, 100 epochs.
stage train_v 2400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/cfg6_v.json --data blobs --synthetic-size 2000 \
  --device-cache --ckpt-dir /tmp/r4/ck --eval-every 25 --no-samples
stage train_eps 2400 python -m ddpm_diffusion_model_tpu.cli train \
  --config scripts/r4/cfg6_eps.json --data blobs --synthetic-size 2000 \
  --device-cache --ckpt-dir /tmp/r4/ck --eval-every 25 --no-samples

# A3: progressive distillation 64->32->16->8->4, CFG w=3 baked into the
# first student (Meng et al. stage 1)
stage distill_pd 3600 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r4/cfg6_v.json --ckpt /tmp/r4/ck/cfg6_v_last --ema \
  --out /tmp/r4/pd4 --data blobs --synthetic-size 2000 --device-cache \
  --start-steps 64 --to-steps 4 --phase-updates 400 --guidance 3

# A4: consistency distillation (one phase, samples at any NFE)
stage distill_cm 3600 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r4/cfg6_v.json --ckpt /tmp/r4/ck/cfg6_v_last --ema \
  --mode consistency --out /tmp/r4/cm --data blobs --synthetic-size 2000 \
  --device-cache --ladder-steps 32 --phase-updates 2000 --guidance 3

# A5: the quality-vs-NFE table + grids (7 sampler rows, one process)
stage quality_nfe 5400 python scripts/r4/quality_nfe.py \
  --ckpt /tmp/r4/ck/cfg6_v_last --config scripts/r4/cfg6_v.json \
  --pd-ckpt /tmp/r4/pd4 --cm-ckpt /tmp/r4/cm \
  --grid-dir docs/artifacts/r4 --out /tmp/r4/nfe.jsonl

# A6: bits/dim on both parameterizations (ops/likelihood.py's first real use)
stage nll_v 2400 python -m ddpm_diffusion_model_tpu.cli eval \
  --config scripts/r4/cfg6_v.json --ckpt /tmp/r4/ck/cfg6_v_last --ema \
  --data blobs --rfid-n 36 --nll 50 --nll-n 64
stage nll_eps 2400 python -m ddpm_diffusion_model_tpu.cli eval \
  --config scripts/r4/cfg6_eps.json --ckpt /tmp/r4/ck/cfg6_eps_last --ema \
  --data blobs --rfid-n 36 --nll 50 --nll-n 64

echo "=== battery A done $(date +%T) ==="
