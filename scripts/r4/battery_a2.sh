#!/bin/bash
# Round-4 battery A2: extended consistency distillation (the 2000-update
# student was undertrained: loss still falling, rFID 3.9) + student-only
# quality re-score.
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
stage distill_cm6k 5400 python -m ddpm_diffusion_model_tpu.cli distill \
  --config scripts/r4/cfg6_v.json --ckpt /tmp/r4/ck/cfg6_v_last --ema \
  --mode consistency --out /tmp/r4/cm6k --data blobs --synthetic-size 2000 \
  --device-cache --ladder-steps 32 --phase-updates 6000 --guidance 3
stage quality_cm6k 3600 python scripts/r4/quality_nfe.py \
  --ckpt /tmp/r4/ck/cfg6_v_last --config scripts/r4/cfg6_v.json \
  --skip-base --cm-ckpt /tmp/r4/cm6k --tag _6k \
  --grid-dir docs/artifacts/r4 --out /tmp/r4/nfe.jsonl
echo "=== battery A2 done $(date +%T) ==="
