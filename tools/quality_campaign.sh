#!/bin/bash
# Paired sampling-variant quality campaign (VERDICT r3 #2a): >= 3 seeds x
# 2k-step paired runs per variant, same seed => same data/init/noise streams
# for every variant. Appends one JSON line per run to the results file.
#
# Variants: shared (1 location group), groupsG (G groups via
# ops/deform_attn.ms_deform_attn_core_grouped), exact (per-head reference
# sampling). The toy model has 4 heads, so groups2 = 2 heads/group — the
# same sharing ratio as the flagship's (8-head) groups4.
#
# Usage: bash tools/quality_campaign.sh [steps] [results_file] [variants...]
set -u
STEPS=${1:-2000}
OUT=${2:-/tmp/quality_campaign.jsonl}
shift 2 2>/dev/null || shift $#
VARIANTS=("$@")
[ ${#VARIANTS[@]} -eq 0 ] && VARIANTS=(shared exact groups2)
cd "$(dirname "$0")/.."
for seed in 0 1 2; do
  for variant in "${VARIANTS[@]}"; do
    base="${variant%%_dec*}"
    case "$base" in
      shared) flags="" ;;
      exact) flags="--exact-sampling" ;;
      groups*) flags="--sampling-groups ${base#groups}" ;;
      *) echo "unknown variant $variant" >&2; exit 2 ;;
    esac
    # optional decoder override suffix: _dec<D> (0 = exact per-head)
    [ "$base" != "$variant" ] && flags="$flags --decoder-sampling-groups ${variant##*_dec}"
    echo "=== seed $seed $variant ($STEPS steps) ===" >&2
    timeout 3000 python tools/validate_static_shapes.py \
      --steps "$STEPS" --seed "$seed" $flags \
      --workdir "/tmp/ssv_s${seed}" --min-ap50 0 2>"/tmp/ssv_${seed}_${variant}.log" \
      | tail -1 >> "$OUT"
  done
done
echo "campaign done -> $OUT" >&2
cat "$OUT"
