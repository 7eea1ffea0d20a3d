"""Production inference: a compiled screening predictor.

Deployment-side counterpart to the training pipelines (beyond the
reference's capability — its closest analog is the one-off triage pass in
semi_supervised.py:472-511): load a trained checkpoint + the calibrated
operating point once, then serve batched predictions with the whole
hot path — fused preprocessing, bf16 forward, softmax, thresholding —
inside a single compiled program per batch shape.

Usage (library):
    predictor = ScreeningPredictor.from_artifacts("outputs", model="semi")
    result = predictor.predict_paths(list_of_jpegs)

CLI: ``python -m src.predict --images DIR [--model semi]``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.runtime.artifacts import ArtifactRegistry
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.train.checkpoints import load_checkpoint

LOGGER = get_logger(__name__)


@dataclass
class PredictionResult:
    paths: List[str]
    prob_positive: np.ndarray
    flagged: np.ndarray
    threshold: float
    positive_class: str


@dataclass
class ServingBundle:
    """A pipeline run's checkpoint + calibrated operating point, resolved.

    Shared by the in-process predictor (:class:`ScreeningPredictor`) and the
    AOT export path (:mod:`ssip_tpu.deploy.export`) so both serve exactly the
    artifacts the training pipelines calibrated.
    """

    variables: dict
    threshold: float
    positive_class: str
    pos_index: int
    classes: Optional[List[str]]
    arch: str
    num_classes: int
    checkpoint_path: Path
    image_size: int = 224


def load_serving_bundle(
    output_dir: Path | str = "outputs",
    model: str = "semi",
    image_size: int = 224,
) -> ServingBundle:
    """Load checkpoint + operating_point.json from a pipeline run.

    The classifier head size comes from the operating point's recorded
    class list (a checkpoint trained on ≠2 classes must not hit an
    opaque msgpack shape mismatch against a hardcoded 2-way template).
    """
    reg = ArtifactRegistry(Path(output_dir))
    ckpt = reg.semi_checkpoint if model == "semi" else reg.baseline_checkpoint

    threshold, positive_class = 0.5, "cancer"
    classes = None
    arch = "resnet18"
    op_path = reg.operating_point_json
    if op_path.exists():
        op = json.loads(op_path.read_text())
        if op.get("threshold") is not None:
            threshold = float(op["threshold"])
        positive_class = op.get("positive_class", positive_class)
        classes = op.get("classes")
        arch = str(op.get("arch", arch))
        # serving must resize to the TRAINING resolution: a ViT's
        # pos_embedding is shaped by it, and for any arch a different grid
        # desynchronizes probabilities from the calibrated threshold
        image_size = int(op.get("image_size", image_size))
    else:
        LOGGER.warning(
            "No operating_point.json under %s — defaulting threshold 0.5",
            output_dir,
        )
        # runs without a threshold policy never write an operating point,
        # but training_history.json still records the arch + training
        # resolution — without them a non-default backbone (vit_*,
        # vit_moe_*) would hit an opaque restore failure against the
        # resnet18 template
        hist_path = reg.training_history_json
        if hist_path.exists():
            hist = json.loads(hist_path.read_text())
            arch = str(hist.get("arch", arch))
            image_size = int(hist.get("image_size", image_size))

    num_classes = len(classes) if classes else 2
    from ssip_tpu.models import MODEL_FACTORIES

    template = seeded_init_host(
        MODEL_FACTORIES[arch](num_classes=num_classes),
        0,
        (1, image_size, image_size, 3),
    )
    try:
        variables = load_checkpoint(ckpt, template)
    except Exception as exc:
        raise RuntimeError(
            f"Failed to restore checkpoint {ckpt} against a "
            f"{num_classes}-class {arch} head (classes from "
            f"{op_path.name}: {classes}). If the checkpoint was trained "
            "with a different class count, regenerate "
            "operating_point.json or pass matching artifacts."
        ) from exc

    if classes and positive_class in classes:
        pos_index = classes.index(positive_class)
    else:
        # legacy operating points lack the class list; fall back to the
        # default dataset's sorted-dir convention (cancer=0, normal=1)
        LOGGER.warning(
            "operating_point.json has no class list — assuming sorted "
            "class dirs for pos_index of '%s'", positive_class,
        )
        pos_index = 0 if positive_class == "cancer" else 1
    return ServingBundle(
        variables=variables,
        threshold=float(threshold),
        positive_class=positive_class,
        pos_index=pos_index,
        classes=classes,
        arch=arch,
        num_classes=num_classes,
        checkpoint_path=ckpt,
        image_size=image_size,
    )


class ScreeningPredictor:
    """Checkpoint + operating point compiled into a batch predictor."""

    def __init__(
        self,
        variables,
        threshold: float,
        positive_class: str,
        pos_index: int,
        image_size: int = 224,
        batch_size: int = 64,
        compute_dtype: str = "float32",
        num_classes: int = 2,
        arch: str = "resnet18",
    ) -> None:
        self.threshold = float(threshold)
        self.positive_class = positive_class
        self.pos_index = int(pos_index)
        self.image_size = image_size
        self.batch_size = batch_size
        self.arch = arch
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        from ssip_tpu.models import MODEL_FACTORIES

        self._model = MODEL_FACTORIES[arch](
            num_classes=num_classes, compute_dtype=dtype
        )
        self._variables = jax.device_put(variables)

        @partial(jax.jit, static_argnames=("steps", "batch"))
        def predict_program(images_u8, variables, steps: int, batch: int):
            batched = images_u8.reshape(steps, batch, *images_u8.shape[1:])

            def body(_, u8):
                from ssip_tpu.ops.augment import eval_preprocess

                # serving inputs are already eval-resized [S, S, 3]; the
                # normalization is the SAME eval chain training used — any
                # divergence here would desynchronize serving from the
                # calibrated operating point
                x = eval_preprocess(u8, dtype=dtype)
                logits = self._model.apply(variables, x, train=False)
                return None, jax.nn.softmax(logits, axis=1)

            _, probs = jax.lax.scan(body, None, batched)
            return probs.reshape(steps * batch, -1)

        self._predict_program = predict_program

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_artifacts(
        cls,
        output_dir: Path | str = "outputs",
        model: str = "semi",
        batch_size: int = 64,
        image_size: int = 224,
        compute_dtype: str = "float32",
    ) -> "ScreeningPredictor":
        """Load checkpoint + operating_point.json from a pipeline run."""
        bundle = load_serving_bundle(output_dir, model=model, image_size=image_size)
        LOGGER.info(
            "Predictor ready: %s checkpoint, threshold %.4f on '%s'",
            model, bundle.threshold, bundle.positive_class,
        )
        return cls(
            bundle.variables, bundle.threshold, bundle.positive_class,
            bundle.pos_index, image_size=bundle.image_size,
            batch_size=batch_size,
            compute_dtype=compute_dtype, num_classes=bundle.num_classes,
            arch=bundle.arch,
        )

    # -- inference ----------------------------------------------------------
    def predict_images(self, images_u8: np.ndarray, paths: Optional[Sequence] = None):
        """images_u8: [N, S, S, 3] eval-resized uint8 (any N; padded inside)."""
        n = int(images_u8.shape[0])
        if n == 0:
            return PredictionResult(
                paths=[], prob_positive=np.empty(0), flagged=np.empty(0, bool),
                threshold=self.threshold, positive_class=self.positive_class,
            )
        steps = max(1, (n + self.batch_size - 1) // self.batch_size)
        padded = steps * self.batch_size
        idx = np.minimum(np.arange(padded), n - 1)
        staged = jnp.asarray(np.asarray(images_u8)[idx])
        probs = np.asarray(
            self._predict_program(
                staged, self._variables, steps=steps, batch=self.batch_size
            )
        )[:n]
        pos_probs = probs[:, self.pos_index]
        return PredictionResult(
            paths=[str(p) for p in (paths or range(n))],
            prob_positive=pos_probs,
            flagged=pos_probs >= self.threshold,
            threshold=self.threshold,
            positive_class=self.positive_class,
        )

    def predict_paths(self, paths: Sequence[Path], num_threads: int = 4):
        """Decode → eval-resize → predict, end to end."""
        from ssip_tpu.data.decode import decode_batch

        arrays, failures = decode_batch(
            [Path(p) for p in paths], convert_rgb=True, num_threads=num_threads
        )
        kept = [(p, a) for p, a in zip(paths, arrays) if a is not None]
        if failures:
            LOGGER.warning("Skipping %d undecodable images", len(failures))
        if not kept:
            raise RuntimeError("No decodable images to predict")
        from ssip_tpu.train.data import _resize_on_device

        resized = np.asarray(
            _resize_on_device([a for _, a in kept], self.image_size)
        )
        return self.predict_images(resized, paths=[p for p, _ in kept])
