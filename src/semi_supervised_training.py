"""CLI: semi-supervised training pipeline (TPU-native).

Flag parity: reference docs/cli_reference.md §src.semi_supervised_training.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from src.supervised_training import add_common_training_flags, config_from_args
from ssip_tpu.pipelines.semi_supervised import run_pipeline


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--strong-data-dir", type=Path, required=True)
    parser.add_argument("--weak-data-dir", type=Path, required=True)
    add_common_training_flags(parser)
    parser.add_argument("--weak-pretrain-epochs", type=int, default=5)
    parser.add_argument("--finetune-epochs", type=int, default=8)
    parser.add_argument("--pseudo-threshold", type=float, default=0.7)
    parser.add_argument("--unlabeled-cohort-csv", type=Path, default=None)
    parser.add_argument(
        "--consistency-weight", type=float, default=0.0,
        help="FixMatch-style augmentation-consistency loss weight during "
        "fine-tuning (0 = off, reference-equivalent)",
    )
    parser.add_argument("--consistency-threshold", type=float, default=0.95)
    parser.add_argument(
        "--strong-augment", choices=("jitter", "randaugment"),
        default="jitter",
        help="strong view for the consistency loss: 'jitter' (flip/rotate/"
        "brightness/contrast) or 'randaugment' (the FixMatch paper's "
        "RandAugment+Cutout policy, device-side)",
    )
    parser.add_argument(
        "--ema-decay", type=float, default=0.0,
        help="Mean-Teacher EMA decay for the consistency pseudo-target "
        "teacher (0 = off, teacher is the live student; 0.999 typical). "
        "Validation and the returned best model follow the EMA average.",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:  # pragma: no cover - thin shim
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    config = config_from_args(args)
    results = run_pipeline(config)
    print(results)


if __name__ == "__main__":
    main()
