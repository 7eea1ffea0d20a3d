"""Sharded, resumable embedding extraction — the corpus-scale path.

The reference aspires to "sharded processing … resumable jobs" for its
4M-image scale-up but implements none of it (SURVEY.md §5.3; reference
docs/presentation.md:157-158). This module provides it TPU-natively:

- the corpus is split into fixed-size shards (deterministic order),
- each shard's embeddings land in ``outputs/features/shards/`` with a
  manifest recording the shard's member paths, digest, row count, and
  completion marker — a crashed/preempted job re-run skips every shard
  whose manifest verifies,
- completed shards merge into the standard ``embeddings.npy``/``.csv``
  artifacts, identical to the single-shot pipeline's output.

Failure detection = manifest digest mismatch (the shard recomputes);
elastic recovery = per-shard granularity restart.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ssip_tpu.data.discovery import ImageRecord, discover_image_records
from ssip_tpu.pipelines.extraction import (
    ExtractionConfig,
    ExtractionSummary,
    extract_embeddings,
    nearest_neighbor_probe,
    run_sanity_checks,
    save_artifacts,
)
from ssip_tpu.data.discovery import compute_dataset_digest
from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


def _shard_digest(records: Sequence[ImageRecord]) -> str:
    hasher = hashlib.sha256()
    for r in records:
        stat = r.absolute_path.stat()
        hasher.update(str(r.relative_path).encode())
        hasher.update(str(stat.st_size).encode())
    return hasher.hexdigest()[:16]


@dataclass
class ShardStatus:
    index: int
    complete: bool
    rows: int


def shard_paths(shards_dir: Path, index: int) -> tuple[Path, Path]:
    return (
        shards_dir / f"shard_{index:05d}.npy",
        shards_dir / f"shard_{index:05d}.manifest.json",
    )


def shard_is_complete(
    shards_dir: Path, index: int, records: Sequence[ImageRecord]
) -> bool:
    npy, manifest_path = shard_paths(shards_dir, index)
    if not (npy.exists() and manifest_path.exists()):
        return False
    try:
        manifest = json.loads(manifest_path.read_text())
        if not manifest.get("complete"):
            return False
        if manifest.get("digest") != _shard_digest(records):
            LOGGER.warning("Shard %d digest changed — recomputing", index)
            return False
        if manifest.get("rows") != len(records):
            return False
        # shards with decode failures legitimately carry fewer embedded rows
        # than member records — validate against the manifest's own count so
        # such shards still resume instead of recomputing forever
        arr = np.load(npy, mmap_mode="r")
        return arr.shape[0] == int(manifest.get("embedded_rows", len(records)))
    except Exception as exc:  # noqa: BLE001 — any corruption → recompute
        LOGGER.warning("Shard %d manifest unreadable (%s) — recomputing", index, exc)
        return False


def run_sharded_extraction(
    cfg: ExtractionConfig, shard_size: int = 512
) -> ExtractionSummary:
    """Resumable extraction; same artifact set as ``run_extraction``."""
    from ssip_tpu.runtime.device import force_cpu_platform_if_requested
    from ssip_tpu.runtime.jaxconfig import setup_jax

    force_cpu_platform_if_requested(cfg.device)
    setup_jax()
    records = discover_image_records(Path(cfg.data_dir))
    digest = compute_dataset_digest(records)
    shards_dir = Path(cfg.output_dir) / "features" / "shards"
    shards_dir.mkdir(parents=True, exist_ok=True)

    shards: List[List[ImageRecord]] = [
        list(records[i : i + shard_size]) for i in range(0, len(records), shard_size)
    ]
    LOGGER.info("Extraction over %d shards of ≤%d images", len(shards), shard_size)

    all_chunks: List[np.ndarray] = []
    kept_records: List[ImageRecord] = []
    failures: List[Path] = []
    total_seconds = 0.0
    per_image: List[float] = []

    for index, shard_records in enumerate(shards):
        npy, manifest_path = shard_paths(shards_dir, index)
        if shard_is_complete(shards_dir, index, shard_records):
            LOGGER.info("Shard %d/%d: reusing completed shard", index + 1, len(shards))
            manifest = json.loads(manifest_path.read_text())
            shard_failures = [str(p) for p in manifest.get("failures", [])]
            failure_set = set(shard_failures)
            all_chunks.append(np.load(npy))
            kept_records.extend(
                r for r in shard_records if str(r.absolute_path) not in failure_set
            )
            # keep the manifest's (ordered) list — set iteration order is
            # per-process salted and would make feature_summary.md unstable
            failures.extend(Path(p) for p in shard_failures)
            continue
        LOGGER.info(
            "Shard %d/%d: extracting %d images", index + 1, len(shards),
            len(shard_records),
        )
        summary = extract_embeddings(shard_records, cfg)
        if summary.embeddings.shape[0] != len(shard_records):
            # drop failed rows from the shard manifest accounting
            LOGGER.warning(
                "Shard %d: %d decode failures", index, len(summary.failures)
            )
        np.save(npy, summary.embeddings.astype(np.float32))
        manifest_path.write_text(
            json.dumps(
                {
                    "complete": True,
                    "digest": _shard_digest(shard_records),
                    "rows": len(shard_records),
                    "embedded_rows": int(summary.embeddings.shape[0]),
                    "failures": [str(p) for p in summary.failures],
                    "weights": summary.weights_source,
                }
            )
        )
        all_chunks.append(summary.embeddings)
        kept_records.extend(summary.records)
        failures.extend(summary.failures)
        total_seconds += summary.total_seconds
        per_image.extend(summary.per_image_seconds)

    embeddings = np.concatenate(all_chunks, axis=0)
    stats = run_sanity_checks(embeddings)
    probe = nearest_neighbor_probe(
        embeddings, kept_records, sample_size=cfg.neighbor_sample, seed=cfg.seed
    )
    summary = ExtractionSummary(
        embeddings=embeddings,
        records=kept_records,
        failures=failures,
        stats=stats,
        neighbor_probe=probe,
        total_seconds=total_seconds,
        per_image_seconds=per_image,
        weights_source="sharded",
    )
    from ssip_tpu.runtime.device import device_label, resolve_devices

    save_artifacts(summary, cfg, digest, device_label(resolve_devices(cfg.device)))
    return summary
