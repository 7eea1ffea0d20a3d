"""CLI: export a trained run as a self-contained AOT serving artifact.

Beyond the reference's surface (it has no deployment story; its closest
analog is reloading ``.pt`` checkpoints in threshold_sweep.py:105-131):
compiles the serving forward to StableHLO via ``jax.export`` — symbolic
batch, cross-platform (cpu+tpu by default) — and bundles it with the
weights and the calibrated operating point into one ``.ssip.npz`` file that
``python -m src.serve`` (or any jax-only host) can run without this repo's
model code.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ssip_tpu.runtime.device import force_cpu_platform_if_requested


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"),
                        help="pipeline run holding checkpoint + operating point")
    parser.add_argument("--model", choices=["baseline", "semi"], default="semi")
    parser.add_argument("--out", type=Path, default=None,
                        help="artifact path (default: "
                        "<output-dir>/models/<model>_serving.ssip.npz)")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16", "int8"],
        default="float32",
        help="float32 (default) matches calibration-time probabilities; "
        "bfloat16 trades O(1e-2) probability shift for TPU throughput; "
        "int8 exports the PTQ max-throughput mode (approximate — "
        "docs/performance.md) and requires --calibration-images",
    )
    parser.add_argument(
        "--calibration-images", type=Path, default=None,
        help="directory of images for int8 activation-scale calibration "
        "(first --calibration-count, sorted)",
    )
    parser.add_argument("--calibration-count", type=int, default=32)
    parser.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma-separated lowering targets baked into the artifact",
    )
    parser.add_argument("--threshold", type=float, default=None,
                        help="override the calibrated operating threshold")
    parser.add_argument("--device", choices=["auto", "cpu"], default="cpu",
                        help="backend for the export trace (cpu default — "
                        "lowering is cross-platform, no TPU needed)")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    import logging

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    force_cpu_platform_if_requested(args.device)
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    from ssip_tpu.deploy.export import ARTIFACT_SUFFIX, export_serving_artifact
    from ssip_tpu.serving import load_serving_bundle

    bundle = load_serving_bundle(
        args.output_dir, model=args.model, image_size=args.image_size
    )
    threshold = bundle.threshold if args.threshold is None else float(args.threshold)
    out = args.out or (
        args.output_dir / "models" / f"{args.model}_serving{ARTIFACT_SUFFIX}"
    )

    calibration_u8 = None
    if args.compute_dtype == "int8":
        if args.calibration_images is None:
            raise SystemExit("--compute-dtype int8 requires --calibration-images")
        import numpy as np

        from ssip_tpu.data.decode import decode_batch
        from ssip_tpu.data.discovery import IMAGE_SUFFIXES
        from ssip_tpu.train.data import _resize_on_device

        paths = sorted(
            p for p in args.calibration_images.rglob("*")
            if p.is_file() and p.suffix.lower() in IMAGE_SUFFIXES
        )[: args.calibration_count]
        if not paths:
            raise SystemExit(f"No images under {args.calibration_images}")
        arrays, _ = decode_batch(paths, convert_rgb=True, num_threads=4)
        arrays = [a for a in arrays if a is not None]
        calibration_u8 = np.asarray(_resize_on_device(arrays, args.image_size))
    path = export_serving_artifact(
        bundle.variables,
        out,
        arch=bundle.arch,
        num_classes=bundle.num_classes,
        image_size=args.image_size,
        compute_dtype=args.compute_dtype,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        threshold=threshold,
        positive_class=bundle.positive_class,
        pos_index=bundle.pos_index,
        classes=bundle.classes,
        calibration_u8=calibration_u8,
    )
    size_mb = path.stat().st_size / 1e6
    print(
        f"Exported {args.model} ({bundle.arch}, thr={threshold:.4f}, "
        f"platforms={args.platforms}) -> {path} ({size_mb:.1f} MB)"
    )


if __name__ == "__main__":
    main()
