"""CLI: standardize embeddings into the clustering feature bundle.

Flag parity: reference docs/cli_reference.md §src.standardize_features.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ssip_tpu.analysis.standardize import standardize_embeddings
from ssip_tpu.runtime.logging import configure_logging


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--embeddings-npy", type=Path, default=Path("outputs/features/embeddings.npy")
    )
    parser.add_argument(
        "--embeddings-csv", type=Path, default=Path("outputs/features/embeddings.csv")
    )
    parser.add_argument(
        "--output-npz",
        type=Path,
        default=Path("outputs/features/standardized_features.npz"),
    )
    parser.add_argument(
        "--log-level", choices=["DEBUG", "INFO", "WARNING", "ERROR"], default="INFO"
    )
    parser.add_argument(
        "--device", choices=["cpu", "auto"], default="cpu",
        help="cpu (default): host CPU backend — a mean/std pass over "
        "[N, 512] gains nothing from an accelerator and skips its "
        "session-init cost; auto: keep the process default backend",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    configure_logging(args.log_level)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    standardize_embeddings(args.embeddings_npy, args.embeddings_csv, args.output_npz)


if __name__ == "__main__":
    main()
