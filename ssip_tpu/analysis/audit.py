"""Dataset audit: inventory, sampled metadata, histograms, markdown report.

Semantics: reference src/data_audit.py — bucket discovery with fail-fast on
missing layout (:79-92), per-subdirectory counts (:95-123), deterministic
``random.Random(seed).sample`` file sampling (:126-138), PIL header metadata
with readable=False tolerance (:141-174), sample grid + width/height/aspect
(+ conditional grayscale intensity) histograms (:203-279), heuristic
observations (:282-315), and the data_audit.md report. Artifact names match:
``tables/{directory_summary,image_summary}.csv``,
``figures/{sample_grid,width_hist,height_hist,aspect_hist,intensity_hist}.png``,
``notes/data_audit.md``. Host-IO-bound by nature — no device work here.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from PIL import Image, UnidentifiedImageError

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)

BUCKET_LABELS = {"avec_labels": "labeled", "sans_label": "unlabeled"}
GRAYSCALE_MODES = {"1", "L", "LA", "I", "F"}


@dataclass(frozen=True)
class FileRecord:
    bucket: str
    relative_path: str
    absolute_path: Path
    width: Optional[int]
    height: Optional[int]
    mode: Optional[str]
    image_format: Optional[str]
    byte_size: int
    readable: bool

    @property
    def aspect_ratio(self) -> Optional[float]:
        if self.width and self.height:
            return self.width / self.height
        return None


def discover_files(data_dir: Path) -> Dict[str, List[Path]]:
    inventory: Dict[str, List[Path]] = defaultdict(list)
    for bucket_dir, bucket in BUCKET_LABELS.items():
        bucket_path = Path(data_dir) / bucket_dir
        if not bucket_path.exists():
            raise FileNotFoundError(f"Missing expected bucket directory: {bucket_path}")
        for file_path in sorted(bucket_path.rglob("*")):
            if file_path.is_file():
                inventory[bucket].append(file_path)
    return inventory


def summarize_directory_tree(
    file_inventory: Dict[str, List[Path]], base_dir: Path
) -> pd.DataFrame:
    records = []
    for bucket, files in file_inventory.items():
        counter: Counter[str] = Counter()
        for path in files:
            parts = path.relative_to(base_dir).parts
            counter[parts[1] if len(parts) > 2 else "(root)"] += 1
        if not counter:
            counter["(root)"] = 0
        for subdir, count in sorted(counter.items()):
            records.append(
                {"bucket": bucket, "subdirectory": subdir, "file_count": count}
            )
    return (
        pd.DataFrame(records)
        .sort_values(["bucket", "subdirectory"])
        .reset_index(drop=True)
    )


def sample_files(
    file_inventory: Dict[str, List[Path]], sample_size: int, seed: int = 42
) -> List[Path]:
    all_files: List[Path] = []
    for files in file_inventory.values():
        all_files.extend(files)
    if not all_files:
        return []
    sample_size = min(sample_size, len(all_files))
    return random.Random(seed).sample(all_files, sample_size)


def extract_metadata(sampled_paths: Iterable[Path], base_dir: Path) -> List[FileRecord]:
    records: List[FileRecord] = []
    for path in sampled_paths:
        relative = path.relative_to(base_dir)
        bucket = BUCKET_LABELS.get(relative.parts[0], relative.parts[0])
        width = height = None
        mode = image_format = None
        readable = True
        try:
            with Image.open(path) as img:
                width, height = img.size
                mode = img.mode
                image_format = img.format
        except (UnidentifiedImageError, OSError):
            readable = False
        records.append(
            FileRecord(
                bucket=bucket,
                relative_path=str(relative),
                absolute_path=path,
                width=width,
                height=height,
                mode=mode,
                image_format=image_format,
                byte_size=path.stat().st_size,
                readable=readable,
            )
        )
    return records


def records_to_dataframe(records: List[FileRecord]) -> pd.DataFrame:
    df = pd.DataFrame(
        [
            {
                "bucket": r.bucket,
                "path": r.relative_path,
                "width": r.width,
                "height": r.height,
                "mode": r.mode,
                "format": r.image_format,
                "bytes": r.byte_size,
                "readable": r.readable,
                "aspect_ratio": r.aspect_ratio,
            }
            for r in records
        ]
    )
    return df.sort_values(["bucket", "path"]).reset_index(drop=True)


def save_sample_grid(records: List[FileRecord], output_path: Path) -> None:
    readable = [r for r in records if r.readable]
    if not readable:
        return
    cols = min(8, len(readable))
    rows = math.ceil(len(readable) / cols)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 2.2, rows * 2.2))
    axes_flat = np.atleast_1d(axes).reshape(-1)
    for ax, record in zip(axes_flat, readable):
        with Image.open(record.absolute_path) as img:
            ax.imshow(img.convert("RGB") if img.mode != "RGB" else img)
        ax.set_title(Path(record.relative_path).name, fontsize=8)
        ax.axis("off")
    for ax in axes_flat[len(readable):]:
        ax.axis("off")
    fig.tight_layout()
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=200)
    plt.close(fig)


def save_histograms(df: pd.DataFrame, base_dir: Path, figures_dir: Path) -> None:
    numeric = df.dropna(subset=["width", "height", "bytes", "aspect_ratio"])
    if numeric.empty:
        return
    figures_dir.mkdir(parents=True, exist_ok=True)
    for column, xlabel, title, color, name in (
        ("width", "Width (pixels)", "Sample Width Distribution", "#3b7ddd", "width_hist.png"),
        ("height", "Height (pixels)", "Sample Height Distribution", "#da5b3b", "height_hist.png"),
        ("aspect_ratio", "Aspect Ratio (W/H)", "Sample Aspect Ratio Distribution", "#5bda3b", "aspect_hist.png"),
    ):
        fig, ax = plt.subplots()
        ax.hist(numeric[column], bins=20, color=color)
        ax.set_xlabel(xlabel)
        ax.set_ylabel("Count")
        ax.set_title(title)
        fig.tight_layout()
        fig.savefig(figures_dir / name, dpi=200)
        plt.close(fig)

    grayscale = [r for _, r in df.iterrows() if r["mode"] in GRAYSCALE_MODES]
    if grayscale:
        fig, ax = plt.subplots()
        for record in grayscale:
            with Image.open(base_dir / record["path"]) as img:
                arr = np.array(img.convert("L")).ravel()
            ax.hist(arr, bins=30, alpha=0.4, label=Path(record["path"]).stem)
        ax.set_xlabel("Pixel Intensity")
        ax.set_ylabel("Frequency")
        ax.set_title("Grayscale Intensity Distribution")
        if len(grayscale) <= 10:
            ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(figures_dir / "intensity_hist.png", dpi=200)
        plt.close(fig)


def generate_observations(df: pd.DataFrame, dir_summary: pd.DataFrame) -> List[str]:
    observations: List[str] = []
    unreadable = int((~df["readable"]).sum())
    if unreadable:
        observations.append(f"Detected {unreadable} unreadable files in the sample.")
    else:
        observations.append("No unreadable files detected in the sampled set.")

    modes = df["mode"].dropna().unique()
    if len(modes) == 1:
        mode = modes[0]
        observations.append(f"Sampled images share a single mode: {mode}.")
        if mode == "RGB":
            observations.append(
                "Convert to a single grayscale channel if downstream models "
                "expect MRI intensity inputs."
            )
        elif mode in {"L", "1"}:
            observations.append(
                "Grayscale inputs align with typical MRI pipelines; ensure "
                "channel handling stays consistent."
            )
    elif len(modes) > 1:
        observations.append(
            f"Mixed image modes detected ({', '.join(modes)}); harmonize "
            "channels before training."
        )

    size_counts = (
        df.dropna(subset=["width", "height"]).groupby(["width", "height"]).size()
    )
    if not size_counts.empty:
        (width, height), dominant = size_counts.idxmax(), size_counts.max()
        observations.append(
            f"Most sampled images are {int(width)}x{int(height)} "
            f"({int(dominant)}/{len(df)}); standardize other files to this resolution."
        )

    observations.append(
        "Normalize pixel intensities to [0, 1] and consider per-image "
        "standardization for contrast stability."
    )
    if dir_summary[dir_summary["bucket"] == "labeled"]["file_count"].sum():
        observations.append(
            "Verify labeled subdirectories align with metadata before "
            "splitting into train/val sets."
        )
    return observations


def write_markdown_report(
    df: pd.DataFrame,
    dir_summary: pd.DataFrame,
    observations: List[str],
    data_dir: Path,
    output_path: Path,
) -> None:
    stats = df[["width", "height", "bytes"]].dropna().astype(int).describe().round(2)
    lines = ["# Data Audit Notes", "", "## Directory Structure", ""]
    for bucket in ("labeled", "unlabeled"):
        rows = dir_summary[dir_summary["bucket"] == bucket]
        total = int(rows["file_count"].sum())
        bucket_dir = data_dir / (
            "avec_labels" if bucket == "labeled" else "sans_label"
        )
        lines.append(f"- **{bucket}** (`{bucket_dir}`): {total} files")
        for _, row in rows.iterrows():
            lines.append(f"  - {row['subdirectory']}: {int(row['file_count'])}")
    lines += ["", "## Sampled Metadata Summary", "", "```", str(stats), "```", ""]
    lines += ["## Observations", ""]
    lines += [f"- {obs}" for obs in observations]
    lines += [
        "",
        "## Artifacts",
        "",
        "- Sample grid: `outputs/figures/sample_grid.png`",
        "- Width histogram: `outputs/figures/width_hist.png`",
        "- Height histogram: `outputs/figures/height_hist.png`",
        "- Aspect ratio histogram: `outputs/figures/aspect_hist.png`",
        "- Sample metadata: `outputs/tables/image_summary.csv`",
        "- Directory summary: `outputs/tables/directory_summary.csv`",
        "",
    ]
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text("\n".join(lines), encoding="utf-8")


def audit_dataset(
    data_dir: Path, sample_size: int, seed: int, output_root: Path = Path("outputs")
) -> pd.DataFrame:
    from ssip_tpu.runtime.artifacts import ArtifactRegistry

    reg = ArtifactRegistry(Path(output_root))
    figures_dir = reg.figures_dir
    notes_path = reg.data_audit_md
    reg.tables_dir.mkdir(parents=True, exist_ok=True)

    inventory = discover_files(data_dir)
    dir_summary = summarize_directory_tree(inventory, data_dir)
    dir_summary.to_csv(reg.directory_summary_csv, index=False)

    sampled = sample_files(inventory, sample_size, seed=seed)
    records = extract_metadata(sampled, data_dir)
    df = records_to_dataframe(records)
    df.to_csv(reg.image_summary_csv, index=False)

    save_sample_grid(records, figures_dir / "sample_grid.png")
    save_histograms(df, data_dir, figures_dir)
    observations = generate_observations(df, dir_summary)
    write_markdown_report(df, dir_summary, observations, data_dir, notes_path)
    LOGGER.info("Audit complete: %d files inventoried, %d sampled",
                sum(len(v) for v in inventory.values()), len(df))
    return df
