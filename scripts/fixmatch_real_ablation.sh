#!/usr/bin/env bash
# Seeded FixMatch-vs-plain ablation on the REAL corpus via the product CLI
# (round-4 verdict task 7). Each seed runs the full semi-supervised
# pipeline twice into throwaway output dirs — identical flags except the
# consistency knobs — then scripts/fixmatch_ablation_report.py collects
# results_comparison*.csv into outputs/notes/fixmatch_ablation.md.
#
# Usage: bash scripts/fixmatch_real_ablation.sh [seeds...]  (default 42 43 44)
set -euo pipefail
cd "$(dirname "$0")/.."
D="${SSIP_DATA_DIR:-/root/reference/mri_dataset_brain_cancer_oc}"
SEEDS=("${@:-42 43 44}")
[[ $# -eq 0 ]] && SEEDS=(42 43 44)
ROOT=outputs/fixmatch_ablation
mkdir -p "$ROOT"
for s in "${SEEDS[@]}"; do
  for arm in plain fixmatch; do
    out="$ROOT/seed${s}_${arm}"
    if [[ -f "$out/tables/results_comparison.csv" ]]; then
      echo "=== $out exists, skipping" >&2; continue
    fi
    extra=()
    if [[ $arm == fixmatch ]]; then
      extra=(--consistency-weight 1.0 --consistency-threshold 0.95
             --strong-augment randaugment --ema-decay 0.98)
    fi
    echo "=== seed $s arm $arm" >&2
    t0=$(date +%s)
    python -m src.semi_supervised_training \
      --strong-data-dir "$D/avec_labels" --weak-data-dir "$D/sans_label" \
      --unlabeled-cohort-csv outputs/tables/unlabeled_cohort_dbscan.csv \
      --target-recall 0.98 --min-precision 0.60 \
      --seed "$s" --finetune-epochs 20 \
      --output-dir "$out" ${extra[@]+"${extra[@]}"}
    echo "=== seed $s arm $arm done in $(( $(date +%s) - t0 ))s" >&2
  done
done
python scripts/fixmatch_ablation_report.py --root "$ROOT"
