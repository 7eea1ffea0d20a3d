"""CLI: export an unlabeled cohort CSV from cluster assignments.

Flag parity: reference docs/cli_reference.md §src.export_unlabeled_cohort.
Semantics: reference src/export_unlabeled_cohort.py:55-79 — keep unlabeled
rows; DBSCAN default keeps non-noise (or one cluster id); K-Means requires a
cluster id; write a single ``path`` column.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--assignments", type=Path,
        default=Path("outputs/tables/cluster_assignments.csv"),
    )
    parser.add_argument("--method", choices=["dbscan", "kmeans"], default="dbscan")
    parser.add_argument("--cluster-id", type=int, default=None)
    parser.add_argument(
        "--output", type=Path, default=Path("outputs/tables/unlabeled_cohort.csv")
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    if not args.assignments.exists():
        raise FileNotFoundError(f"Assignments CSV not found: {args.assignments}")
    df = pd.read_csv(args.assignments)
    required = {"path", "is_labeled", f"cluster_{args.method}"}
    missing = required - set(df.columns)
    if missing:
        raise KeyError(f"Assignments CSV missing columns: {sorted(missing)}")

    pool = df[~df["is_labeled"].astype(bool)]
    col = f"cluster_{args.method}"
    if args.cluster_id is not None:
        pool = pool[pool[col] == args.cluster_id]
    elif args.method == "dbscan":
        pool = pool[pool[col] != -1]  # all non-noise
    else:
        raise ValueError("--cluster-id is required when --method kmeans")

    if pool.empty:
        raise RuntimeError("Cohort selection produced no rows")
    args.output.parent.mkdir(parents=True, exist_ok=True)
    pool[["path"]].to_csv(args.output, index=False)
    print(f"Wrote {len(pool)} cohort rows to {args.output}")


if __name__ == "__main__":
    main()
