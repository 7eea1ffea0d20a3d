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
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    configure_logging(args.log_level)
    standardize_embeddings(args.embeddings_npy, args.embeddings_csv, args.output_npz)


if __name__ == "__main__":
    main()
