"""AOT serving export: ``jax.export`` StableHLO artifacts with a manifest.

The exported program is the exact serving forward the in-process predictor
runs (``ssip_tpu/serving.py``): eval normalization → classifier forward
(``train=False``) → softmax, on ``uint8 [b, S, S, 3]`` eval-resized input
with a **symbolic batch dimension** — one compile-once program serves any
batch size. Weights stay *arguments* of the exported function (not baked-in
constants, per the repo invariant — and so a re-trained checkpoint can be
dropped into an existing artifact's params without re-exporting).

Artifact format (one ``.npz`` — a plain zip, inspectable with ``np.load``):

    __manifest__   uint8 bytes of a JSON manifest (schema below)
    __stablehlo__  uint8 bytes of the serialized jax.export blob
    var/<path>     one array per weight leaf, '/'-joined flax dict keys

Manifest schema (version 1): ``{version, arch, num_classes, image_size,
compute_dtype, platforms, threshold, positive_class, pos_index, classes,
jax_version, input, output}``. The threshold/positive-class fields carry the
calibrated operating point (reference common.py:668-746 selects it; we ship
it WITH the model so serving can never desynchronize from calibration).

Exports are cross-platform by default (``platforms=("cpu", "tpu")``): an
artifact exported on a CPU-only build runs unmodified on a TPU host.
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

MANIFEST_VERSION = 1
DEFAULT_PLATFORMS = ("cpu", "tpu")
ARTIFACT_SUFFIX = ".ssip.npz"


def _flatten_variables(variables) -> Dict[str, np.ndarray]:
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(variables)
    out = {}
    for key_tuple, leaf in flat.items():
        if any("/" in str(k) for k in key_tuple):
            raise ValueError(f"'/' in variable path {key_tuple}")
        out["/".join(str(k) for k in key_tuple)] = np.asarray(leaf)
    return out


def _unflatten_variables(flat: Dict[str, np.ndarray]):
    from flax.traverse_util import unflatten_dict

    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def build_serving_fn(arch: str, num_classes: int, compute_dtype: str):
    """The serving forward: normalize → apply(train=False) → softmax.

    Identical math to ``ScreeningPredictor``'s per-batch program (asserted
    by tests/test_deploy.py), kept as a free function so the AOT export and
    the in-process predictor cannot drift apart.
    """
    import jax
    import jax.numpy as jnp

    from ssip_tpu.models import MODEL_FACTORIES
    from ssip_tpu.ops.augment import eval_preprocess

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = MODEL_FACTORIES[arch](num_classes=num_classes, compute_dtype=dtype)

    def serving_fn(variables, images_u8):
        x = eval_preprocess(images_u8, dtype=dtype)
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=1)

    return serving_fn


def build_serving_fn_int8(arch: str):
    """int8-PTQ serving forward: quantized backbone + f32 fc head + softmax.

    The bundle is the nested-dict form of the ``models.quantized`` tree
    (``blocks`` as a sorted dict — npz storage round-trips dicts, not
    lists) plus the f32 ``fc`` site. Same control flow as the in-process
    ``--compute-dtype int8`` path with ``stem_prequantized=False`` (the
    Pallas quantizing-preproc fusion is a TPU-runtime detail, not part of
    the portable artifact). This is the throughput mode — quantization
    noise bounds live in tests/test_quantized.py; parity serving keeps
    float32.
    """
    import jax
    import jax.numpy as jnp

    from ssip_tpu.models.quantized import make_quantized_apply
    from ssip_tpu.models.resnet import MODEL_STAGES
    from ssip_tpu.ops.augment import eval_preprocess

    if arch not in MODEL_STAGES:
        raise ValueError(
            f"int8 export covers the ResNet family only, got --arch {arch}; "
            "export the ViT archs with --compute-dtype bfloat16"
        )
    q_apply = make_quantized_apply(
        MODEL_STAGES[arch], bottleneck=arch == "resnet50"
    )

    def serving_fn(bundle, images_u8):
        qtree = {
            "stem": bundle["stem"],
            "blocks": [bundle["blocks"][k] for k in sorted(bundle["blocks"])],
        }
        x = eval_preprocess(images_u8, dtype=jnp.float32)
        feats = q_apply(qtree, x)
        logits = feats @ bundle["fc"]["kernel"] + bundle["fc"]["bias"]
        return jax.nn.softmax(logits.astype(jnp.float32), axis=1)

    return serving_fn


def quantized_serving_bundle(variables, calibration_u8, arch: str):
    """variables + uint8 eval-resized calibration batch → int8 bundle tree."""
    import jax.numpy as jnp

    from ssip_tpu.models.quantized import quantize_extractor
    from ssip_tpu.models.resnet import MODEL_STAGES
    from ssip_tpu.ops.augment import eval_preprocess

    if arch not in MODEL_STAGES:
        raise ValueError(
            f"int8 export covers the ResNet family only, got --arch {arch}; "
            "export the ViT archs with --compute-dtype bfloat16"
        )
    if "fc" not in variables.get("params", {}):
        raise ValueError(
            "int8 export needs a classifier checkpoint (no 'fc' head found)"
        )
    calib = eval_preprocess(jnp.asarray(calibration_u8), dtype=jnp.float32)
    qtree = quantize_extractor(
        variables, calib, MODEL_STAGES[arch], bottleneck=arch == "resnet50"
    )
    return {
        "stem": qtree["stem"],
        "blocks": {
            f"block{i:02d}": blk for i, blk in enumerate(qtree["blocks"])
        },
        "fc": {
            "kernel": variables["params"]["fc"]["kernel"],
            "bias": variables["params"]["fc"]["bias"],
        },
    }


def export_serving_artifact(
    variables,
    out_path: Path | str,
    *,
    arch: str = "resnet18",
    num_classes: int = 2,
    image_size: int = 224,
    compute_dtype: str = "float32",
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    threshold: float = 0.5,
    positive_class: str = "cancer",
    pos_index: int = 0,
    classes: Optional[List[str]] = None,
    calibration_u8: Optional[np.ndarray] = None,
) -> Path:
    """Export ``variables`` as a self-contained serving artifact.

    Returns the written path. The batch dimension is symbolic (any b ≥ 1).
    ``compute_dtype="int8"`` exports the PTQ throughput mode and requires
    ``calibration_u8`` (eval-resized uint8 images for activation scales).
    """
    import jax
    from jax import export as jexport

    calibration_images = 0
    if compute_dtype == "int8":
        if calibration_u8 is None:
            raise ValueError("int8 export requires calibration images")
        serving_fn = build_serving_fn_int8(arch)
        variables = quantized_serving_bundle(variables, calibration_u8, arch)
        calibration_images = int(np.shape(calibration_u8)[0])
    else:
        serving_fn = build_serving_fn(arch, num_classes, compute_dtype)

    host_vars = jax.device_get(variables)
    (b,) = jexport.symbolic_shape("b")
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        host_vars,
    )
    img_spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), np.uint8)
    exported = jexport.export(
        jax.jit(serving_fn), platforms=tuple(platforms)
    )(var_spec, img_spec)

    manifest = {
        "version": MANIFEST_VERSION,
        "arch": arch,
        "num_classes": int(num_classes),
        "image_size": int(image_size),
        "compute_dtype": compute_dtype,
        "platforms": list(platforms),
        "threshold": float(threshold),
        "positive_class": positive_class,
        "pos_index": int(pos_index),
        "classes": classes,
        "jax_version": jax.__version__,
        "input": f"uint8 [b, {image_size}, {image_size}, 3], eval-resized",
        "output": f"float32 softmax probabilities [b, {num_classes}]",
        "calibration_images": calibration_images,
    }

    payload = {
        "__manifest__": np.frombuffer(
            json.dumps(manifest).encode("utf-8"), dtype=np.uint8
        ),
        "__stablehlo__": np.frombuffer(exported.serialize(), dtype=np.uint8),
    }
    for key, arr in _flatten_variables(host_vars).items():
        payload[f"var/{key}"] = arr

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    # np.savez appends '.npz' when absent; write via a buffer so the path
    # the caller asked for is exactly the path on disk.
    buf = io.BytesIO()
    np.savez(buf, **payload)
    out_path.write_bytes(buf.getvalue())
    return out_path


class ExportedModel:
    """A loaded serving artifact: deserialized program + weights + manifest.

    Loading needs jax + numpy only — none of the model code, flax, or the
    checkpoint-porting machinery. Batch sizes are bucketed to powers of two
    (padding repeats the final row) so a server sees a bounded set of
    compiled shapes even though the export itself accepts any batch.
    """

    def __init__(self, exported_call, variables, manifest: dict,
                 max_batch: int = 256) -> None:
        self._call = exported_call
        self._variables = variables
        self.manifest = dict(manifest)
        self.max_batch = int(max_batch)
        self.image_size = int(manifest["image_size"])
        self.threshold = float(manifest["threshold"])
        self.positive_class = str(manifest["positive_class"])
        self.pos_index = int(manifest["pos_index"])

    @classmethod
    def load(cls, path: Path | str, max_batch: int = 256) -> "ExportedModel":
        from jax import export as jexport

        with np.load(Path(path)) as z:
            manifest = json.loads(bytes(z["__manifest__"]).decode("utf-8"))
            if manifest.get("version") != MANIFEST_VERSION:
                raise ValueError(
                    f"Unsupported serving-artifact version "
                    f"{manifest.get('version')!r} (supported: {MANIFEST_VERSION})"
                )
            blob = bytes(z["__stablehlo__"])
            flat = {
                k[len("var/"):]: z[k] for k in z.files if k.startswith("var/")
            }
        variables = _unflatten_variables(flat)
        exported = jexport.deserialize(blob)
        return cls(exported.call, variables, manifest, max_batch=max_batch)

    # -- inference ----------------------------------------------------------
    def _bucket(self, n: int) -> int:
        b = 1
        while b < n and b < self.max_batch:
            b *= 2
        return b

    def predict_probs(self, images_u8: np.ndarray) -> np.ndarray:
        """uint8 [N, S, S, 3] → float32 probs [N, num_classes]."""
        images_u8 = np.asarray(images_u8)
        n = int(images_u8.shape[0])
        if n == 0:
            return np.empty((0, int(self.manifest["num_classes"])), np.float32)
        s = self.image_size
        if images_u8.shape[1:] != (s, s, 3):
            raise ValueError(
                f"Expected eval-resized input [N, {s}, {s}, 3], got "
                f"{images_u8.shape} — resize upstream (see predict_paths)"
            )
        out = []
        for start in range(0, n, self.max_batch):
            chunk = images_u8[start:start + self.max_batch]
            bucket = self._bucket(len(chunk))
            idx = np.minimum(np.arange(bucket), len(chunk) - 1)
            probs = np.asarray(self._call(self._variables, chunk[idx]))
            out.append(probs[: len(chunk)])
        return np.concatenate(out, axis=0)

    def predict_images(self, images_u8: np.ndarray, paths=None):
        from ssip_tpu.serving import PredictionResult

        probs = self.predict_probs(images_u8)
        pos = probs[:, self.pos_index]
        return PredictionResult(
            paths=[str(p) for p in (paths if paths is not None else range(len(pos)))],
            prob_positive=pos,
            flagged=pos >= self.threshold,
            threshold=self.threshold,
            positive_class=self.positive_class,
        )

    def predict_paths(self, paths: Sequence[Path], num_threads: int = 4):
        """Decode → eval-resize → predict — same chain as the predictor."""
        from ssip_tpu.data.decode import decode_batch
        from ssip_tpu.train.data import _resize_on_device

        arrays, failures = decode_batch(
            [Path(p) for p in paths], convert_rgb=True, num_threads=num_threads
        )
        kept = [(p, a) for p, a in zip(paths, arrays) if a is not None]
        if not kept:
            raise RuntimeError("No decodable images to predict")
        resized = np.asarray(
            _resize_on_device([a for _, a in kept], self.image_size)
        )
        result = self.predict_images(resized, paths=[p for p, _ in kept])
        return result, [str(p) for p in failures]
