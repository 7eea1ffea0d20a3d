#!/usr/bin/env bash
# Full 5-stage reference workflow on the current default device (TPU when
# available), regenerating the complete outputs/ artifact contract:
# audit → extraction → standardize → clustering → cohort export →
# supervised → semi-supervised → threshold sweeps → reporting.
# Mirrors the reference's committed run flags (target-recall 0.98,
# min-precision 0.60, DBSCAN auto-eps cohort; reference
# docs/evaluation.md:117-126, notes/training_report.md:29-32).
set -euo pipefail
cd "$(dirname "$0")/.."
D="${SSIP_DATA_DIR:-/root/reference/mri_dataset_brain_cancer_oc}"
# SSIP_DEVICE=cpu forces every device-aware stage onto the host platform
# (survives a downed TPU tunnel — see CLAUDE.md); empty = default (TPU).
DEVFLAG=()
if [[ -n "${SSIP_DEVICE:-}" ]]; then DEVFLAG=(--device "$SSIP_DEVICE"); fi

stage() {
  local name="$1"; shift
  local t0 t1
  t0=$(date +%s.%N)
  echo "=== $name: $*" >&2
  "$@"
  t1=$(date +%s.%N)
  echo "=== $name done in $(awk -v a="$t0" -v b="$t1" 'BEGIN{printf "%.1f", b-a}')s" >&2
}

stage audit        python -m src.data_audit --data-dir "$D"
stage extraction   python -m src.feature_extraction --data-dir "$D" ${DEVFLAG[@]+"${DEVFLAG[@]}"}
stage standardize  python -m src.standardize_features
stage clustering   python -m src.clustering \
  --features-npz outputs/features/standardized_features.npz \
  --dbscan-auto --dbscan-scope unlabeled
stage cohort       python -m src.export_unlabeled_cohort \
  --method dbscan --output outputs/tables/unlabeled_cohort_dbscan.csv
stage supervised   python -m src.supervised_training \
  --strong-data-dir "$D/avec_labels" \
  --target-recall 0.98 --min-precision 0.60 ${DEVFLAG[@]+"${DEVFLAG[@]}"}
stage semi         python -m src.semi_supervised_training \
  --strong-data-dir "$D/avec_labels" --weak-data-dir "$D/sans_label" \
  --unlabeled-cohort-csv outputs/tables/unlabeled_cohort_dbscan.csv \
  --target-recall 0.98 --min-precision 0.60 ${DEVFLAG[@]+"${DEVFLAG[@]}"}
stage sweep_base   python -m src.threshold_sweep \
  --strong-data-dir "$D/avec_labels" --model baseline ${DEVFLAG[@]+"${DEVFLAG[@]}"}
stage sweep_semi   python -m src.threshold_sweep \
  --strong-data-dir "$D/avec_labels" --model semi ${DEVFLAG[@]+"${DEVFLAG[@]}"}
stage export       python -m src.export_model --model semi
stage comparison   python scripts/generate_model_comparison.py
stage reporting    python scripts/generate_reporting_assets.py
stage readme       python scripts/generate_outputs_readme.py
echo "=== workflow complete; artifacts under outputs/" >&2
