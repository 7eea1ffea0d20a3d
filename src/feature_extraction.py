"""CLI: frozen ResNet-18 512-D feature extraction (TPU-native).

Flag surface parity: reference docs/cli_reference.md §src.feature_extraction
(--data-dir, --device, --batch-size, --verbose) plus TPU-native extras
(--weights, --compute-dtype, --output-dir) that default to reference behavior.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--data-dir", type=Path, default=Path("mri_dataset_brain_cancer_oc")
    )
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    parser.add_argument(
        "--weights",
        type=Path,
        default=None,
        help="torch ResNet-18 state_dict (.pt/.pth) to port; default: "
        "$SSIP_RESNET18_WEIGHTS or seeded random init",
    )
    parser.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16", "int8"],
        default="float32"
    )
    parser.add_argument(
        "--arch",
        choices=[
            "resnet18", "resnet34", "resnet50",
            "vit_t16", "vit_s16", "vit_b16",
            "vit_moe_t16", "vit_moe_s16",
        ],
        default="resnet18",
        help="backbone architecture (reference uses frozen resnet18; "
        "resnet50 yields 2048-D embeddings, vit_b16 768-D class tokens, "
        "vit_moe_* Switch-style mixture-of-experts towers)",
    )
    parser.add_argument("--no-cache", action="store_true", help="skip decode cache")
    parser.add_argument(
        "--streaming", choices=["auto", "always", "never"], default="auto",
        help="overlapped decode→H2D→embed stream in O(batch) host memory; "
        "auto streams only when the decoded corpus exceeds host RAM budget",
    )
    speed = parser.add_mutually_exclusive_group()
    speed.add_argument(
        "--fast-decode", action="store_true",
        help="streaming turbo mode: DCT-scaled JPEG decode + host crop "
        "(approximate resample numerics; implies --streaming always)",
    )
    speed.add_argument(
        "--host-preproc", action="store_true",
        help="streaming with EXACT host-side PIL resize+crop so only the "
        "network crop crosses the host-device link (no numerics change; "
        "implies --streaming always)",
    )
    parser.add_argument(
        "--shard-size", type=int, default=0,
        help="enable sharded resumable extraction with this many images per "
        "shard (0 = single-shot)",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    cfg = ExtractionConfig(
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        batch_size=args.batch_size,
        device=args.device,
        verbose=args.verbose,
        weights=args.weights,
        compute_dtype=args.compute_dtype,
        arch=args.arch,
        cache_decoded=not args.no_cache,
        streaming=(
            "always"
            if (args.fast_decode or args.host_preproc)
            else args.streaming
        ),
        fast_decode=args.fast_decode,
        host_preproc=args.host_preproc,
    )
    if args.shard_size > 0:
        from ssip_tpu.pipelines.sharded_extraction import run_sharded_extraction

        summary = run_sharded_extraction(cfg, shard_size=args.shard_size)
    else:
        summary = run_extraction(cfg)
    print(
        f"Extracted {summary.embeddings.shape[0]} embeddings "
        f"({summary.embeddings.shape[1]}-D) in {summary.total_seconds:.2f}s"
    )


if __name__ == "__main__":
    main()
