"""Frozen ResNet-18 embedding extraction — the throughput-critical pipeline.

TPU-native re-design of the reference workload (call stack: SURVEY.md §3.1;
reference src/feature_extraction.py): discovery → decode-once image store →
double-buffered host→HBM feed → one jitted step fusing the Pallas preprocess
kernel with the frozen backbone forward, sharded over the mesh's data axis →
sanity checks, cosine NN probe (on device), digest, artifact set
(embeddings.npy/.csv, metadata.json, feature_summary.md) with schemas
identical to the reference's.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from functools import lru_cache as _lru_cache, partial

from ssip_tpu.data.discovery import (
    ImageRecord,
    compute_dataset_digest,
    discover_image_records,
)
from ssip_tpu.data.decode import try_decode_image
from ssip_tpu.data.pipeline import (
    ImageStore,
    iter_device_batches,
    iter_streamed_decode_batches,
)
from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.port_torch import (
    check_weights_match_arch as _check_weights_match_arch,
    load_torch_checkpoint,
)
from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
from ssip_tpu.ops.resize import extraction_preprocess
from ssip_tpu.parallel.mesh import batch_sharding, build_mesh, pad_to_multiple
from ssip_tpu.runtime.artifacts import ArtifactRegistry
from ssip_tpu.runtime.device import device_label, resolve_devices
from ssip_tpu.runtime.logging import configure_logging, get_logger

LOGGER = get_logger(__name__)

DEFAULT_WEIGHTS_ENV = "SSIP_RESNET18_WEIGHTS"
# uint8 corpus size below which the whole dataset is staged in HBM and
# embedded in one fused dispatch (v5e has 16 GB HBM; leave room for the
# model + activations + preprocessed batch).
_RESIDENT_BUDGET_BYTES = 6 * 1024**3


@dataclass
class ExtractionConfig:
    data_dir: Path = Path("mri_dataset_brain_cancer_oc")
    output_dir: Path = Path("outputs")
    batch_size: int = 32
    device: str = "auto"
    verbose: bool = False
    weights: Optional[Path] = None  # torch .pt/.pth state_dict to port
    resize: int = 256
    crop: int = 224
    seed: int = 42
    neighbor_sample: int = 8
    # "float32" (parity) | "bfloat16" (throughput) | "int8" (max-throughput
    # post-training quantization — models/quantized.py; approximate like
    # bfloat16 but more so, accuracy envelope pinned in tests)
    compute_dtype: str = "float32"
    # backbone (ssip_tpu.models.MODEL_FACTORIES key); the reference uses a
    # frozen resnet18 (feature_extraction.py:210-227), 34/50 are extras.
    arch: str = "resnet18"
    cache_decoded: bool = True
    num_decode_threads: int = 8
    # "auto" | "always" | "never": stream decode→H2D→embed as a 3-stage
    # overlapped pipeline in O(batch) host memory instead of decoding the
    # whole corpus up front. "auto" streams only when there is no decoded
    # cache and the corpus would not fit the host-RAM budget.
    streaming: str = "auto"
    # Optional bf16 variant: fold BN into conv weights (+ space-to-depth
    # stem) before the forward (models/inference.py). Measured head-to-head
    # on v5e this is ~1-2.5% SLOWER than the plain forward — XLA already
    # constant-folds inference BN into the conv and handles the stem — so
    # the default is the plain forward; the module remains as the measured
    # record and for backends where XLA's fusion differs.
    fast_inference: bool = False
    # Streaming turbo mode (approximate): DCT-scaled decode + host-side
    # resize/crop so only crop²×3 uint8 bytes cross the host→device link.
    # Off by default — it changes resample numerics vs the PIL-exact chain.
    fast_decode: bool = False
    # Streaming EXACT host preprocessing: full-quality decode, then the
    # reference's PIL bilinear Resize(resize) + center-crop on the host
    # (both bitwise what the device chain computes), so only crop²×3 bytes
    # cross the link with NO numerics change. The right shape when the
    # host→device link, not the host CPU, bounds e2e throughput.
    # (Caveat: rows whose decoded shape differs from the corpus majority
    # are resized ONCE, host-side, straight to the target — the store path
    # resamples such odd rows twice, to the majority shape then on device —
    # so only those rows can differ between modes, and by fewer resamples.)
    # Mutually exclusive with fast_decode.
    host_preproc: bool = False

    def __post_init__(self) -> None:
        if self.compute_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"compute_dtype must be float32|bfloat16|int8, got "
                f"{self.compute_dtype!r}"
            )
        if self.crop > self.resize:
            raise ValueError(
                f"--crop ({self.crop}) must be <= --resize ({self.resize}): "
                "the resized short side cannot satisfy a larger center crop"
            )


@dataclass
class ExtractionSummary:
    embeddings: np.ndarray
    records: List[ImageRecord]
    failures: List[Path]
    stats: Dict[str, float]
    neighbor_probe: List[Dict[str, Any]]
    total_seconds: float
    per_image_seconds: List[float]
    weights_source: str


def _resolve_weights(cfg: ExtractionConfig) -> tuple[dict, str]:
    """Load ported torchvision weights if available, else seeded init.

    The north-star parity mode needs real IMAGENET1K_V1 weights; when they
    are absent (no-egress environments) a deterministic seeded init keeps
    the pipeline runnable and reproducible, and the metadata records which
    weights actually produced the artifact.
    """
    candidates: list[Path] = []
    if cfg.weights is not None:
        candidates.append(Path(cfg.weights))
    env = os.environ.get(DEFAULT_WEIGHTS_ENV)
    if env:
        candidates.append(Path(env))
    candidates.append(
        Path(cfg.output_dir) / "models" / f"{cfg.arch}_imagenet1k.pt"
    )

    for path in candidates:
        explicit = cfg.weights is not None and path == Path(cfg.weights)
        if path.exists():
            LOGGER.info("Porting torch weights from %s", path)
            variables = load_torch_checkpoint(str(path), include_fc=False)
            try:
                _check_weights_match_arch(
                    variables, cfg.arch, path, env_hint=DEFAULT_WEIGHTS_ENV
                )
            except ValueError as exc:
                # Arch mismatch is fatal only for an explicit --weights
                # path. The env/convention candidates are r18-centric
                # defaults (the documented workflow exports them once) —
                # with --arch resnet34/50 they simply don't apply: warn and
                # fall through to the next candidate / seeded init.
                if explicit:
                    raise
                LOGGER.warning(
                    "Skipping candidate checkpoint %s (wrong architecture "
                    "for --arch %s): %s", path, cfg.arch, exc,
                )
                continue
            return variables, f"ported:{path}"
        if explicit:
            raise FileNotFoundError(f"Weights checkpoint not found: {path}")

    LOGGER.warning(
        "No pretrained checkpoint found — using seeded random init "
        "(embeddings will NOT match the torchvision reference)."
    )
    from ssip_tpu.models.host_init import seeded_init_host

    model = MODEL_FACTORIES[cfg.arch](num_classes=None)
    variables = seeded_init_host(model, cfg.seed, (1, cfg.crop, cfg.crop, 3))
    return variables, f"random_init:seed={cfg.seed}"


@_lru_cache(maxsize=8)
def _embed_fns(
    resize: int, crop: int, compute_dtype_name: str, use_pallas: bool,
    fast: bool = False, arch: str = "resnet18",
):
    """Module-cached jitted embed programs.

    Built once per (chain config, dtype, backend) so repeated callers —
    notably the per-shard loop in sharded extraction — reuse jit traces and
    compiled executables instead of re-tracing every call.

    ``fast=True`` uses the folded-BN / space-to-depth forward
    (``ssip_tpu.models.inference``); its ``variables`` argument is then the
    folded pytree from ``fold_resnet_extractor``.
    """
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    full_step = None  # set only by paths that own their whole step
    if compute_dtype_name == "int8":
        # Post-training-quantized forward (models/quantized.py resp.
        # models/quantized_vit.py): the ``variables`` argument is the int8
        # tree from ``quantize_extractor``/``quantize_vit_extractor``
        # (built once per run with a real calibration batch — see
        # _quantize_variables). The preprocess chain feeds it normalized
        # f32; quantization happens inside.
        compute_dtype = jnp.float32
        if arch.startswith("vit"):
            from ssip_tpu.models.quantized_vit import make_quantized_vit_apply

            if arch.startswith("vit_moe"):
                raise ValueError(
                    "int8 PTQ is implemented for the dense ViTs only; run "
                    f"--arch {arch} with --compute-dtype float32/bfloat16"
                )
            q_apply = make_quantized_vit_apply(arch=arch)
            q_apply_pre = make_quantized_vit_apply(
                arch=arch, stem_prequantized=True
            )
        else:
            from ssip_tpu.models.quantized import make_quantized_apply
            from ssip_tpu.models.resnet import MODEL_STAGES

            q_apply = make_quantized_apply(
                stage_sizes=MODEL_STAGES[arch], bottleneck=arch == "resnet50"
            )
            q_apply_pre = make_quantized_apply(
                stage_sizes=MODEL_STAGES[arch],
                bottleneck=arch == "resnet50",
                stem_prequantized=True,
            )

        def model_apply(variables, x):
            return q_apply(variables, x)

        if use_pallas:
            # Fuse the stem-input quantization into the preproc kernel's
            # epilogue: it emits the stem's int8 operand directly, skipping
            # one [crop², 3] f32 HBM round-trip per image.
            def full_step(variables, u8):
                x_q8 = preprocess_images_pallas(
                    u8, resize=resize, crop=crop,
                    quant_inv_scale=variables["stem"]["inv_in_scale"],
                )
                return q_apply_pre(variables, x_q8)
    elif fast:
        from ssip_tpu.models.inference import make_folded_apply
        from ssip_tpu.models.resnet import MODEL_STAGES

        folded_apply = make_folded_apply(
            stage_sizes=MODEL_STAGES[arch],
            bottleneck=arch == "resnet50",
            compute_dtype=compute_dtype,
        )

        def model_apply(variables, x):
            return folded_apply(variables, x)
    else:
        model = MODEL_FACTORIES[arch](num_classes=None, compute_dtype=compute_dtype)

        def model_apply(variables, x):
            return model.apply(variables, x, train=False)

    def preprocess(u8: jax.Array) -> jax.Array:
        if use_pallas:
            return preprocess_images_pallas(
                u8, resize=resize, crop=crop, out_dtype=compute_dtype
            )
        return extraction_preprocess(u8, resize=resize, crop=crop, dtype=compute_dtype)

    if full_step is None:
        def full_step(variables, u8):
            return model_apply(variables, preprocess(u8))

    @partial(jax.jit, static_argnames=("steps", "batch"))
    def embed_corpus(images: jax.Array, variables, steps: int, batch: int) -> jax.Array:
        batched = images.reshape(steps, batch, *images.shape[1:])

        def body(_, u8):
            return None, full_step(variables, u8)

        _, feats = jax.lax.scan(body, None, batched)
        return feats.reshape(steps * batch, -1)

    embed_step = jax.jit(lambda u8, variables: full_step(variables, u8))
    return embed_corpus, embed_step


def run_sanity_checks(embeddings: np.ndarray) -> Dict[str, float]:
    """NaN/inf fail-fast + aggregate stats (schema: reference :334-356)."""
    arr = jnp.asarray(embeddings)
    if bool(jnp.isnan(arr).any()):
        raise ValueError("Embedding matrix contains NaN values")
    if bool(jnp.isinf(arr).any()):
        raise ValueError("Embedding matrix contains inf values")
    return {
        "num_vectors": int(arr.shape[0]),
        "dimension": int(arr.shape[1]),
        "mean_abs_mean": float(jnp.abs(arr.mean(axis=0)).mean()),
        "mean_std": float(arr.std(axis=0).mean()),
    }


def nearest_neighbor_probe(
    embeddings: np.ndarray,
    records: List[ImageRecord],
    sample_size: int = 8,
    seed: int = 42,
) -> List[Dict[str, Any]]:
    """Cosine NN spot check, computed as one device matmul.

    Same sampling discipline as the reference (:359-398): numpy Generator
    seeded with ``seed`` choosing queries without replacement.
    """
    n = embeddings.shape[0]
    if n < 2:
        return []
    sample_size = min(sample_size, n - 1)
    if sample_size <= 0:
        return []
    rng = np.random.default_rng(seed)
    sample = rng.choice(n, size=sample_size, replace=False)

    emb = jnp.asarray(embeddings)
    normalized = emb / jnp.clip(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sims = normalized[sample] @ normalized.T  # [S, N]
    sims = sims.at[jnp.arange(sample_size), jnp.asarray(sample)].set(-jnp.inf)
    neighbor_idx = np.asarray(jnp.argmax(sims, axis=1))
    best_sim = np.asarray(jnp.max(sims, axis=1))

    return [
        {
            "query": str(records[int(q)].relative_path),
            "neighbor": str(records[int(nb)].relative_path),
            "similarity": float(s),
        }
        for q, nb, s in zip(sample, neighbor_idx, best_sim)
    ]


# Host-RAM budget for the decode-once store; corpora above this stream in
# O(batch) memory instead (the 4M-image scale target would need ~3 TB RAM
# decoded — reference docs/presentation.md:151-158 aspiration).
_HOST_STAGE_BUDGET_BYTES = 4 * 1024**3


def _header_shape(path: Path) -> Optional[tuple[int, int, int]]:
    """Decoded shape of one image from its HEADER — no pixel decode.

    ``Image.open`` is lazy: it reads only the metadata needed for
    ``.size``/``.getbands()``, so probing a shape costs microseconds, not a
    full decode. Matches what ``decode_image`` would produce: single-band
    (grayscale) images are stacked to 3 channels there, so bands==1 → 3.
    """
    from PIL import Image

    try:
        with Image.open(path) as img:
            w, h = img.size
            bands = len(img.getbands())
    except Exception:  # noqa: BLE001 — probe tolerates what decode tolerates
        return None
    return h, w, 3 if bands == 1 else bands


def _probe_image_shape(paths: List[Path]) -> tuple[int, int, int]:
    """Shape of the first readable image (header read, no decode)."""
    for p in paths:
        shape = _header_shape(p)
        if shape is not None:
            return shape
    raise RuntimeError("All images failed to decode")


def _probe_majority_shape(
    paths: List[Path], sample_size: int = 64, num_threads: int = 8
) -> tuple[int, int, int]:
    """Majority decoded shape over the corpus's leading sample.

    The streamed execution shape canonicalizes every row to this — it must
    agree with ``ImageStore.from_paths``' majority-shape packing, or a
    mixed-shape corpus whose FIRST image is a minority shape would make
    ``streaming='auto'`` results depend on cache presence (ADVICE r2). A
    bounded sample keeps the probe O(1) for huge corpora; corpora whose
    global majority differs from their leading-sample majority remain
    ambiguous by construction — both paths then resample the same rows.

    Shapes come from image HEADERS (``_header_shape``) — decoding (and
    discarding) the sample's pixels here would cost the 1-core host a full
    extra batch of decode work per streamed run, all of it outside the
    timed e2e span.
    """
    from collections import Counter

    shapes = [
        s for s in (_header_shape(p) for p in paths[:sample_size])
        if s is not None
    ]
    if not shapes:
        # fall back to scanning past an all-failed leading sample
        return _probe_image_shape(paths[sample_size:])
    return Counter(shapes).most_common(1)[0][0]  # type: ignore[return-value]


def _should_stream(cfg: ExtractionConfig, paths: List[Path], digest: str) -> bool:
    if cfg.streaming == "always" or cfg.fast_decode or cfg.host_preproc:
        # the host-preproc/turbo shapes only exist on the stream — honoring
        # them from library callers must not depend on the CLI's
        # "implies --streaming always" shim
        return True
    if cfg.streaming != "auto" or not paths:
        return False
    if cfg.cache_decoded:
        cache_dir = Path(cfg.output_dir) / "cache"
        data_path, meta_path = ImageStore._cache_paths(cache_dir, digest[:16])
        if data_path.exists() and meta_path.exists():
            return False  # memmap-backed store beats re-decoding
    shape = _probe_image_shape(paths)
    return int(np.prod(shape)) * len(paths) > _HOST_STAGE_BUDGET_BYTES


def _calibration_batch(
    cfg: ExtractionConfig, paths: List[Path], sample_size: int = 32
):
    """Normalized f32 [n, crop, crop, 3] batch for int8 PTQ calibration.

    Decodes the corpus's first ``sample_size`` readable images (sorted
    discovery order → deterministic) through the EXACT host chain
    (decode → short-side resize → center crop, bitwise the device chain),
    then applies the ImageNet normalization on host. One-off cost of one
    small decode batch, paid only in ``--compute-dtype int8`` runs.
    """
    from ssip_tpu.data.decode import decode_batch, preprocess_host_exact
    from ssip_tpu.ops.resize import IMAGENET_MEAN, IMAGENET_STD

    arrays, _ = decode_batch(
        paths[:sample_size], num_threads=cfg.num_decode_threads
    )
    frames = [
        preprocess_host_exact(a, cfg.resize, cfg.crop)
        for a in arrays
        if a is not None
    ]
    frames = [f for f in frames if f.shape == (cfg.crop, cfg.crop, 3)]
    if not frames:
        raise RuntimeError(
            "int8 calibration failed: no decodable images in the corpus's "
            f"first {sample_size} files"
        )
    x = np.stack(frames).astype(np.float32)
    mean = 255.0 * np.asarray(IMAGENET_MEAN, np.float32)
    inv_std = 1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))
    return jnp.asarray((x - mean) * inv_std)


def _quantize_variables(cfg: ExtractionConfig, variables, paths: List[Path]):
    """variables → int8 PTQ tree for this corpus (models/quantized.py for
    the ResNet family, models/quantized_vit.py for the ViTs)."""
    calib = _calibration_batch(cfg, paths)
    LOGGER.info(
        "int8 PTQ: calibrated activation scales on %d images", calib.shape[0]
    )
    if cfg.arch.startswith("vit"):
        from ssip_tpu.models.quantized_vit import quantize_vit_extractor

        if cfg.arch.startswith("vit_moe"):
            raise ValueError(
                "int8 PTQ is implemented for the dense ViTs only; run "
                f"--arch {cfg.arch} with --compute-dtype float32/bfloat16"
            )
        return quantize_vit_extractor(variables, calib, arch=cfg.arch)
    from ssip_tpu.models.quantized import quantize_extractor
    from ssip_tpu.models.resnet import MODEL_STAGES

    return quantize_extractor(
        variables,
        calib,
        stage_sizes=MODEL_STAGES[cfg.arch],
        bottleneck=cfg.arch == "resnet50",
    )


def _prepare_inference(cfg: ExtractionConfig, variables):
    """(fast?, pytree-to-pass): fold BN + s2d stem in bf16 throughput mode.

    In int8 mode ``variables`` is already the quantized tree (built in
    ``extract_embeddings``) and passes through untouched.
    """
    # folded-BN is a ResNet concept; ViT (no BN) always takes the plain apply
    fast = (
        cfg.fast_inference
        and cfg.compute_dtype == "bfloat16"
        and not cfg.arch.startswith("vit")
    )
    if fast:
        from ssip_tpu.models.inference import fold_resnet_extractor
        from ssip_tpu.models.resnet import MODEL_STAGES

        return True, fold_resnet_extractor(
            variables,
            stage_sizes=MODEL_STAGES[cfg.arch],
            bottleneck=cfg.arch == "resnet50",
        )
    return False, variables


def _extract_streaming(
    records: List[ImageRecord],
    cfg: ExtractionConfig,
    variables,
    weights_source: str,
    mesh,
    sharding,
    devices,
) -> ExtractionSummary:
    """Constant-host-memory execution shape: decode ∥ H2D ∥ embed.

    Throughput is max(decode, transfer, compute) rather than their sum; host
    memory stays O(prefetch × batch) regardless of corpus size.
    """
    paths = [r.absolute_path for r in records]
    turbo = bool(cfg.fast_decode)
    stream_kwargs: Dict[str, Any] = {}
    if turbo or cfg.host_preproc:
        # Host-side resize+crop: only crop²×3 bytes per image cross the
        # host→device link and the device chain degenerates to
        # normalize-only (identity resample at resize == crop). Turbo adds
        # DCT-scaled decode (approximate); host_preproc keeps the
        # full-quality decode + PIL bilinear resize — bitwise the same
        # chain the device computes, so numerics are unchanged.
        h = w = cfg.crop
        c = 3
        stream_kwargs = dict(host_resize=cfg.resize, host_crop=cfg.crop)
        if turbo:
            stream_kwargs["fast_scale"] = cfg.resize
        resize_for_device = cfg.crop
    else:
        h, w, c = _probe_majority_shape(
            paths,
            sample_size=max(cfg.batch_size, 64),
            num_threads=cfg.num_decode_threads,
        )
        resize_for_device = cfg.resize
    use_pallas = devices[0].platform == "tpu" and h == w and c == 3
    global_batch = pad_to_multiple(cfg.batch_size, mesh.shape["data"])
    fast, apply_tree = _prepare_inference(cfg, variables)
    _, embed_step = _embed_fns(
        resize_for_device, cfg.crop, cfg.compute_dtype, use_pallas, fast,
        arch=cfg.arch,
    )
    variables_dev = jax.device_put(apply_tree)

    failures: List[Path] = []
    chunks: list[np.ndarray] = []
    kept_positions: list[int] = []
    # Dispatch embeds asynchronously and fetch features through a bounded
    # sliding window: a per-batch np.asarray would serialize every batch on
    # the device round-trip (25-150 ms dispatch latency here), while an
    # unbounded window would hold O(corpus) features in HBM. 8 outstanding
    # batches keeps compute/D2H overlapped with the next batch's decode+H2D
    # in O(1) device memory.
    pending: list[tuple[jax.Array, int]] = []
    max_outstanding = 8

    def drain(limit: int) -> None:
        while len(pending) > limit:
            feats, valid = pending.pop(0)
            chunks.append(np.asarray(feats[:valid], dtype=np.float32))

    t_start = time.perf_counter()
    for batch in iter_streamed_decode_batches(
        paths,
        global_batch,
        (h, w, c),
        convert_rgb=False,  # extraction policy: no RGB conversion
        num_threads=cfg.num_decode_threads,
        sharding=sharding,
        prefetch=2,
        failures=failures,
        **stream_kwargs,
    ):
        pending.append((embed_step(batch.data, variables_dev), batch.valid))
        kept_positions.extend(int(i) for i in batch.indices)
        drain(max_outstanding)
    drain(0)
    total = time.perf_counter() - t_start
    per_image_times = (
        [total / len(kept_positions)] * len(kept_positions)
        if kept_positions
        else []
    )
    if not chunks:
        raise RuntimeError("No embeddings were generated; all images failed to decode?")
    embeddings = np.concatenate(chunks, axis=0)
    kept_records = [records[i] for i in kept_positions]
    LOGGER.info(
        "Streamed %d embeddings in %.2fs (%.1f imgs/s end-to-end, overlapped "
        "decode/H2D/compute, O(batch) host memory)",
        len(embeddings), total, len(embeddings) / max(total, 1e-9),
    )

    stats = run_sanity_checks(embeddings)
    probe = nearest_neighbor_probe(
        embeddings, kept_records, sample_size=cfg.neighbor_sample, seed=cfg.seed
    )
    return ExtractionSummary(
        embeddings=embeddings,
        records=kept_records,
        failures=failures,
        stats=stats,
        neighbor_probe=probe,
        total_seconds=total,
        per_image_seconds=per_image_times,
        weights_source=weights_source,
    )


def extract_embeddings(
    records: List[ImageRecord], cfg: ExtractionConfig
) -> ExtractionSummary:
    if cfg.fast_decode and cfg.host_preproc:
        raise ValueError(
            "fast_decode (approximate DCT-scaled decode) and host_preproc "
            "(exact numerics) are mutually exclusive — pick one."
        )
    devices = resolve_devices(cfg.device)
    mesh = build_mesh(devices=devices)
    sharding = batch_sharding(mesh)
    LOGGER.info("Extraction on %s (mesh data=%d)", device_label(devices), mesh.shape["data"])

    variables, weights_source = _resolve_weights(cfg)

    digest = compute_dataset_digest(records)
    paths = [r.absolute_path for r in records]
    if cfg.compute_dtype == "int8":
        variables = _quantize_variables(cfg, variables, paths)
        weights_source += "+int8_ptq"
    if _should_stream(cfg, paths, digest):
        return _extract_streaming(
            records, cfg, variables, weights_source, mesh, sharding, devices
        )
    # The e2e clock starts HERE so total_seconds covers disk → decode →
    # stage → embed, matching what the reference's logged rate measures
    # (reference src/feature_extraction.py:275-300 times its decode+forward
    # loop). With a warm decode cache the store build is a memmap open ≈ 0 s.
    t_start = time.perf_counter()
    store = ImageStore.from_paths(
        paths,
        convert_rgb=False,  # extraction policy: no RGB conversion
        num_threads=cfg.num_decode_threads,
        cache_dir=Path(cfg.output_dir) / "cache" if cfg.cache_decoded else None,
        cache_key=digest[:16],
    )
    t_store = time.perf_counter()
    failures = list(store.failures)
    valid = store.valid_indices()

    h, w = store.image_shape[0], store.image_shape[1]
    # Pallas (Mosaic) kernels are TPU-only — every other backend (cpu, gpu)
    # takes the equivalent XLA path.
    use_pallas = (
        devices[0].platform == "tpu" and h == w and store.image_shape[2] == 3
    )

    # one fixed batch shape for the whole stream → single executable
    global_batch = pad_to_multiple(cfg.batch_size, mesh.shape["data"])

    fast, apply_tree = _prepare_inference(cfg, variables)
    embed_corpus, embed_step = _embed_fns(
        cfg.resize, cfg.crop, cfg.compute_dtype, use_pallas, fast,
        arch=cfg.arch,
    )

    # Two execution shapes, picked by corpus size:
    #  - resident: stage ALL images in HBM once, embed everything in ONE
    #    fused scan dispatch — optimal when the uint8 corpus fits a memory
    #    budget (dispatch latency and H2D stalls vanish);
    #  - streamed: double-buffered feeder, one dispatch per batch — the
    #    constant-memory path for corpora beyond the budget (pairs with
    #    sharded extraction for full scale-out).
    corpus_bytes = int(np.prod(store.image_shape)) * len(valid)
    resident = corpus_bytes <= _RESIDENT_BUDGET_BYTES and not store.failures

    # Parameters are explicit jit ARGUMENTS (device-resident), never Python
    # closures — closed-over numpy arrays get baked into the program as
    # constants, bloating the HLO by the model size and wrecking both
    # compile time and the persistent-cache hit rate.
    variables_dev = jax.device_put(apply_tree)

    if resident and len(valid) > 0:
        n = len(valid)
        padded = pad_to_multiple(n, global_batch)
        steps = padded // global_batch

        staged = store.gather(valid)
        if padded != n:
            staged = np.concatenate(
                [staged, np.zeros((padded - n, *staged.shape[1:]), staged.dtype)]
            )
        t_stage = time.perf_counter()
        images_dev = jax.device_put(staged, sharding)
        images_dev.block_until_ready()
        LOGGER.info(
            "Staged %d images (%.0f MB) in HBM: decode %.1fs, gather %.1fs, "
            "transfer %.1fs",
            padded, staged.nbytes / 1e6, t_store - t_start, t_stage - t_store,
            time.perf_counter() - t_stage,
        )
        del staged
        t_embed = time.perf_counter()
        feats = embed_corpus(images_dev, variables_dev, steps=steps, batch=global_batch)
        embeddings = np.asarray(feats[:n], dtype=np.float32)
        LOGGER.info(
            "Fused embed of %d images: %.1fs (compile amortized on reruns)",
            n, time.perf_counter() - t_embed,
        )
        total = time.perf_counter() - t_start
        per_image_times = [total / n] * n
    else:
        chunks: list[np.ndarray] = []
        per_image_times = []
        t_batch = t_start
        for batch in iter_device_batches(
            store, valid, global_batch, sharding=sharding, prefetch=2
        ):
            feats = embed_step(batch.data, variables_dev)
            feats_host = np.asarray(feats[: batch.valid], dtype=np.float32)
            chunks.append(feats_host)
            now = time.perf_counter()
            per_image_times.extend([(now - t_batch) / batch.valid] * batch.valid)
            t_batch = now
        total = time.perf_counter() - t_start
        if not chunks:
            raise RuntimeError(
                "No embeddings were generated; all images failed to decode?"
            )
        embeddings = np.concatenate(chunks, axis=0)
    kept_records = [records[int(i)] for i in valid]
    LOGGER.info(
        "Extracted %d embeddings in %.2fs (%.1f imgs/s end-to-end)",
        len(embeddings),
        total,
        len(embeddings) / max(total, 1e-9),
    )

    stats = run_sanity_checks(embeddings)
    probe = nearest_neighbor_probe(
        embeddings, kept_records, sample_size=cfg.neighbor_sample, seed=cfg.seed
    )
    return ExtractionSummary(
        embeddings=embeddings,
        records=kept_records,
        failures=failures,
        stats=stats,
        neighbor_probe=probe,
        total_seconds=total,
        per_image_seconds=per_image_times,
        weights_source=weights_source,
    )


def save_artifacts(
    summary: ExtractionSummary, cfg: ExtractionConfig, digest: str, device_str: str
) -> None:
    """Artifact set with reference-identical schemas (reference :401-502)."""
    import pandas as pd

    reg = ArtifactRegistry(Path(cfg.output_dir))
    reg.features_dir.mkdir(parents=True, exist_ok=True)
    reg.notes_dir.mkdir(parents=True, exist_ok=True)

    np.save(reg.embeddings_npy, summary.embeddings.astype(np.float32))

    pd.DataFrame(
        [
            {
                "index": i,
                "path": str(r.relative_path),
                "bucket": r.bucket,
                "label": r.label,
            }
            for i, r in enumerate(summary.records)
        ]
    ).to_csv(reg.embeddings_csv, index=False)

    metadata = {
        "backbone": f"ssip_tpu.flax.{cfg.arch}",
        "architecture": cfg.arch,
        "weights": summary.weights_source,
        "layer": "global_avg_pool",
        "embedding_dimension": int(summary.embeddings.shape[1]),
        "input_resize": cfg.resize,
        "input_crop": cfg.crop,
        "normalization_mean": [0.485, 0.456, 0.406],
        "normalization_std": [0.229, 0.224, 0.225],
        "channel_policy": "No conversion (assumes RGB inputs)",
        "date_utc": datetime.now(timezone.utc).isoformat(),
        "num_images": int(summary.embeddings.shape[0]),
        "failed_images": len(summary.failures),
        "device": device_str,
        "dataset_dir": str(cfg.data_dir),
        "dataset_digest": digest,
        "sanity_checks": summary.stats,
        "neighbor_probe": summary.neighbor_probe,
    }
    reg.features_metadata_json.write_text(json.dumps(metadata, indent=2))

    mean_latency = float(np.mean(summary.per_image_seconds)) if summary.per_image_seconds else float("nan")
    median_latency = float(np.median(summary.per_image_seconds)) if summary.per_image_seconds else float("nan")
    failure_section = (
        "None" if not summary.failures else "\n".join(f"- {p}" for p in summary.failures)
    )
    neighbor_lines = ["| Query | Neighbor | Cosine |", "| --- | --- | --- |"]
    for item in summary.neighbor_probe:
        neighbor_lines.append(
            f"| {item['query']} | {item['neighbor']} | {item['similarity']:.4f} |"
        )
    neighbor_block = (
        "\n".join(neighbor_lines)
        if summary.neighbor_probe
        else "No neighbors computed (insufficient samples)."
    )

    reg.feature_summary_md.write_text(
        f"""# Feature Extraction Summary

- Backbone: ssip_tpu.flax.{cfg.arch} ({summary.weights_source})
- Layer: global average pooled features ({summary.embeddings.shape[1]}-D)
- Input spec: resize {cfg.resize} → center crop {cfg.crop}, ImageNet normalization
- Batch size: {cfg.batch_size}
- Device: {device_str}
- Total images processed: {summary.embeddings.shape[0]}
- Failed decodes: {len(summary.failures)}
- Mean per-image latency (s): {mean_latency:.4f}
- Median per-image latency (s): {median_latency:.4f}

## Sanity Check Statistics

- Mean of |dimension means|: {summary.stats['mean_abs_mean']:.6f}
- Mean of dimension standard deviations: {summary.stats['mean_std']:.6f}

## Nearest Neighbor Spot Check

{neighbor_block}

## Decode Failures

{failure_section}
""",
    )


def run_extraction(cfg: ExtractionConfig) -> ExtractionSummary:
    from ssip_tpu.runtime.device import force_cpu_platform_if_requested
    from ssip_tpu.runtime.jaxconfig import setup_jax

    force_cpu_platform_if_requested(cfg.device)
    setup_jax()
    reg = ArtifactRegistry(Path(cfg.output_dir))
    reg.logs_dir.mkdir(parents=True, exist_ok=True)
    configure_logging("DEBUG" if cfg.verbose else "INFO", log_file=reg.extraction_log)

    records = discover_image_records(Path(cfg.data_dir))
    LOGGER.info(
        "Discovered %d images (labeled=%d, unlabeled=%d)",
        len(records),
        sum(1 for r in records if r.bucket == "labeled"),
        sum(1 for r in records if r.bucket == "unlabeled"),
    )
    digest = compute_dataset_digest(records)
    summary = extract_embeddings(records, cfg)
    devices = resolve_devices(cfg.device)
    save_artifacts(summary, cfg, digest, device_label(devices))
    return summary
