#!/usr/bin/env bash
# One-command reproduction of the reference's pretrained-regime numbers
# (round-4 verdict task 7): drop in a torchvision IMAGENET1K_V1 ResNet-18
# checkpoint, run the full 5-stage workflow, and diff the resulting
# quality table against BASELINE.md's targets (±0.01 F1/recall; embedding
# sanity stats vs reference outputs/features/metadata.json:25-30).
#
# Usage:
#   bash scripts/reproduce_baseline.sh /path/to/resnet18_imagenet1k.pt
#   bash scripts/reproduce_baseline.sh            # checkpoint already at
#                                                 # outputs/models/resnet18_imagenet1k.pt
#
# Exit code 0 iff every metric lands within tolerance. Without a
# checkpoint the script refuses (this is the parity gate, not the demo —
# use scripts/run_full_workflow.sh for seeded-init runs).
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT_DEST=outputs/models/resnet18_imagenet1k.pt
if [[ $# -ge 1 ]]; then
  mkdir -p outputs/models
  if [[ "$(readlink -f "$1")" != "$(readlink -f "$CKPT_DEST" 2>/dev/null || echo '')" ]]; then
    cp "$1" "$CKPT_DEST"
  fi
fi
if [[ ! -f "$CKPT_DEST" && -z "${SSIP_RESNET18_WEIGHTS:-}" ]]; then
  echo "ERROR: no pretrained checkpoint. Pass the .pt path as the first" >&2
  echo "argument or set SSIP_RESNET18_WEIGHTS. (BASELINE.md parity is" >&2
  echo "defined against torchvision IMAGENET1K_V1 weights.)" >&2
  exit 2
fi

bash scripts/run_full_workflow.sh

python scripts/compare_baseline.py --outputs outputs
