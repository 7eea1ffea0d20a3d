"""CLI: HTTP scoring endpoint for a trained screening model.

Beyond the reference's surface (no serving exists there): serves either an
AOT artifact from ``src.export_model`` (``--model-file``, jax-only load) or
a pipeline run's checkpoint directly (``--output-dir``/``--model``). See
``ssip_tpu/deploy/server.py`` for the endpoint contract.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ssip_tpu.runtime.device import force_cpu_platform_if_requested


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-file", type=Path, default=None,
                        help="exported .ssip.npz artifact (src.export_model)")
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"),
                        help="pipeline run (used when --model-file is absent)")
    parser.add_argument("--model", choices=["baseline", "semi"], default="semi")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--max-batch", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16"], default="float32")
    parser.add_argument("--device", choices=["auto", "cpu"], default="auto")
    return parser.parse_args(argv)


def build_model(args):
    if args.model_file is not None:
        from ssip_tpu.deploy.export import ExportedModel

        return ExportedModel.load(args.model_file, max_batch=args.max_batch)
    from ssip_tpu.serving import ScreeningPredictor

    return ScreeningPredictor.from_artifacts(
        args.output_dir, model=args.model, batch_size=args.max_batch,
        image_size=args.image_size, compute_dtype=args.compute_dtype,
    )


def main(argv=None) -> None:
    import logging

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    force_cpu_platform_if_requested(args.device)
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    from ssip_tpu.deploy.server import make_server

    model = build_model(args)
    httpd = make_server(model, host=args.host, port=args.port)
    host, port = httpd.server_address[:2]
    print(f"Serving on http://{host}:{port} (POST /predict, /predict_paths)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


if __name__ == "__main__":
    main()
