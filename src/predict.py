"""CLI: batch screening inference with a trained model (serving path).

Beyond the reference's surface (its triage pass is embedded in training):
loads a pipeline run's checkpoint + calibrated operating point and predicts
any directory of images, writing a triage-schema CSV.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from ssip_tpu.data.discovery import IMAGE_SUFFIXES


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", type=Path, required=True,
                        help="directory of images (or a single file)")
    parser.add_argument("--model", choices=["baseline", "semi"], default="semi")
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"),
                        help="pipeline run holding checkpoint + operating point")
    parser.add_argument("--output", type=Path, default=None,
                        help="CSV destination (default: stdout)")
    parser.add_argument("--threshold", type=float, default=None,
                        help="override the calibrated operating threshold")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16"], default="float32",
        help="float32 (default) matches the calibration-time probabilities "
        "exactly; bfloat16 trades O(1e-2) probability shift for throughput",
    )
    parser.add_argument(
        "--device", choices=["auto", "cpu", "cuda"], default="auto",
        help="cpu restricts backend discovery to the CPU plugin before any "
        "jax touch (survives a down accelerator tunnel); cuda accepted for "
        "reference-CLI compatibility and treated as auto",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    from ssip_tpu.runtime.device import force_cpu_platform_if_requested

    force_cpu_platform_if_requested(args.device)
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    from ssip_tpu.serving import ScreeningPredictor

    predictor = ScreeningPredictor.from_artifacts(
        args.output_dir, model=args.model, batch_size=args.batch_size,
        compute_dtype=args.compute_dtype,
    )
    if args.threshold is not None:
        predictor.threshold = float(args.threshold)

    if args.images.is_file():
        paths = [args.images]
    else:
        paths = sorted(
            p for p in args.images.rglob("*")
            if p.is_file() and p.suffix.lower() in IMAGE_SUFFIXES
        )
    if not paths:
        raise SystemExit(f"No images under {args.images}")

    result = predictor.predict_paths(paths)

    import pandas as pd

    df = pd.DataFrame(
        {
            "path": result.paths,
            "prob_positive": result.prob_positive,
            "flagged": result.flagged,
        }
    )
    if args.output is not None:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(args.output, index=False)
        print(
            f"Predicted {len(df)} images ({int(df.flagged.sum())} flagged at "
            f"thr={result.threshold:.4f} for '{result.positive_class}') -> {args.output}"
        )
    else:
        print(df.to_csv(index=False))


if __name__ == "__main__":
    main()
