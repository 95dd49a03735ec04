#!/bin/bash
# Round-5 paired quality campaign driver (VERDICT r4 #2): exact vs hybrid
# at the REAL 800x1344 canvas, >=10k steps, >=3 paired seeds, AP curves,
# int8-gather eval overlay on the hybrid runs.  Runs are sequential (one
# TPU chip); each appends one JSON line to docs/quality_campaign_r5.jsonl,
# so a killed campaign keeps every completed run.
#
# Usage: tools/quality_campaign_r5.sh [steps] [seeds...]
set -u
cd "$(dirname "$0")/.."
STEPS=${1:-10000}
shift || true
SEEDS=("${@:-0 1 2}")
[ $# -eq 0 ] && SEEDS=(0 1 2)
OUT=docs/quality_campaign_r5.jsonl
for seed in "${SEEDS[@]}"; do
  for variant in exact hybrid; do
    if grep -q "\"variant\": \"$variant\", \"seed\": $seed," "$OUT" 2>/dev/null; then
      echo "== skip $variant seed $seed (already recorded)"
      continue
    fi
    echo "== $variant seed $seed ($STEPS steps) =="
    timeout 10800 python tools/quality_campaign_r5.py \
      --variant "$variant" --seed "$seed" --steps "$STEPS" \
      --eval-every 1000 --out "$OUT" \
      || echo "RUN FAILED: $variant seed $seed rc=$?"
  done
done
echo "campaign complete: $(wc -l < "$OUT") runs in $OUT"
