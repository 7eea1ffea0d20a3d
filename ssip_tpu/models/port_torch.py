"""Torch→Flax weight porting for the ResNet and ViT families.

The north-star parity target requires embeddings from ported torchvision
weights to match the reference bitwise-close (BASELINE.md). This module maps
a torchvision-style ``state_dict`` (names like ``conv1.weight``,
``layer2.0.downsample.0.weight``, ``fc.bias``; see torchvision's resnet
checkpoint layout) onto the variable tree of :class:`ssip_tpu.models.ResNet`,
and the ``vision_transformer`` layout (``conv_proj.*``, ``class_token``,
``encoder.layers.encoder_layer_i.*``, ``heads.head.*``) onto
:class:`ssip_tpu.models.vit.VisionTransformer`. The family is detected from
the state_dict's keys.

Layout conversions:
  - conv kernels  OIHW → HWIO  (transpose 2,3,1,0)
  - dense kernels [out,in] → [in,out]
  - BN weight/bias → scale/bias; running_mean/var → batch_stats
  - ViT: the stacked ``in_proj_weight`` [3D, D] transposes straight into the
    fused ``qkv`` Dense kernel [D, 3D] (same q|k|v then head-major order)

No torch import is required to port: callers pass numpy arrays. A torch
``state_dict`` helper is provided for convenience when torch is installed.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

ArrayDict = Dict[str, np.ndarray]


def _block_module_name(stage: int, block: int) -> str:
    return f"layer{stage}_{block}"


def torch_key_to_flax(key: str) -> Optional[tuple[str, tuple[str, ...], str]]:
    """Map one torch state_dict key to (collection, module-path, param-name).

    Returns None for keys that have no Flax counterpart
    (``num_batches_tracked``).
    """
    if key.endswith("num_batches_tracked"):
        return None

    m = re.match(r"^layer(\d+)\.(\d+)\.(.+)$", key)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        mod = _block_module_name(stage, block)
        if rest.startswith("downsample.0."):
            sub, leaf = "downsample_conv", rest.split(".")[-1]
        elif rest.startswith("downsample.1."):
            sub, leaf = "downsample_bn", rest.split(".")[-1]
        else:
            sub, leaf = rest.split(".", 1)
        is_bn = "bn" in sub
        return (_leaf_collection(leaf, is_bn), (mod, sub), _leaf_to_flax(leaf, is_bn))

    head, leaf = key.split(".", 1)
    if head in ("conv1", "fc"):
        return (_leaf_collection(leaf, is_bn=False), (head,), _leaf_to_flax(leaf, is_bn=False))
    if head == "bn1":
        return (_leaf_collection(leaf, is_bn=True), (head,), _leaf_to_flax(leaf, is_bn=True))
    raise KeyError(f"Unrecognized torch parameter key: {key}")


def _leaf_to_flax(leaf: str, is_bn: bool) -> str:
    if is_bn:
        return {
            "weight": "scale",
            "bias": "bias",
            "running_mean": "mean",
            "running_var": "var",
        }[leaf]
    return {"weight": "kernel", "bias": "bias"}[leaf]


def _leaf_collection(leaf: str, is_bn: bool) -> str:
    if is_bn and leaf in ("running_mean", "running_var"):
        return "batch_stats"
    return "params"


def _convert_value(key: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if key.endswith("weight") and value.ndim == 4:  # conv OIHW → HWIO
        return np.transpose(value, (2, 3, 1, 0))
    if key == "fc.weight":  # dense [out, in] → [in, out]
        return np.transpose(value, (1, 0))
    return value


# --- ViT (torchvision vision_transformer layout) ---------------------------

_VIT_ATTN_LEAVES = {
    "in_proj_weight": "kernel",
    "in_proj_bias": "bias",
}
# torchvision >= 0.13 serializes MLPBlock as a Sequential (mlp.0 / mlp.3);
# its back-compat shim also accepts the older linear_1 / linear_2 names —
# we accept both too.
_VIT_MLP_MODS = {"0": "mlp_1", "3": "mlp_2", "linear_1": "mlp_1", "linear_2": "mlp_2"}


def is_vit_state_dict(state_dict) -> bool:
    return any(
        k == "class_token" or k.startswith("conv_proj.") for k in state_dict
    )


def vit_torch_key_to_flax(key: str) -> Optional[tuple[str, tuple[str, ...], str]]:
    """Map a torchvision ViT state_dict key to (collection, path, leaf)."""
    if key == "class_token":
        return ("params", (), "cls_token")
    if key == "encoder.pos_embedding":
        return ("params", (), "pos_embedding")
    if key.startswith("conv_proj."):
        return ("params", ("conv_proj",), _leaf_to_flax(key.split(".")[-1], False))
    if key.startswith("encoder.ln."):
        return ("params", ("ln",), _vit_ln_leaf(key.split(".")[-1]))
    if key.startswith("heads.head."):
        return ("params", ("fc",), _leaf_to_flax(key.split(".")[-1], False))
    m = re.match(r"^encoder\.layers\.encoder_layer_(\d+)\.(.+)$", key)
    if m:
        block, rest = f"block{m.group(1)}", m.group(2)
        parts = rest.split(".")
        if parts[0] in ("ln_1", "ln_2"):
            return ("params", (block, parts[0]), _vit_ln_leaf(parts[-1]))
        if parts[0] == "self_attention":
            if parts[1] in _VIT_ATTN_LEAVES:
                return ("params", (block, "qkv"), _VIT_ATTN_LEAVES[parts[1]])
            if parts[1] == "out_proj":
                return ("params", (block, "out"), _leaf_to_flax(parts[-1], False))
        if parts[0] == "mlp" and parts[1] in _VIT_MLP_MODS:
            return (
                "params",
                (block, _VIT_MLP_MODS[parts[1]]),
                _leaf_to_flax(parts[-1], False),
            )
    raise KeyError(f"Unrecognized torch ViT parameter key: {key}")


def _vit_ln_leaf(leaf: str) -> str:
    return {"weight": "scale", "bias": "bias"}[leaf]


def _vit_convert_value(key: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if value.ndim == 4:  # patch conv OIHW → HWIO
        return np.transpose(value, (2, 3, 1, 0))
    if value.ndim == 2:  # every 2-D ViT weight is a dense [out, in] → [in, out]
        return np.transpose(value, (1, 0))
    return value


def port_state_dict(
    state_dict: Mapping[str, Any], include_fc: bool = True
) -> Dict[str, Dict]:
    """Build ``{"params": ..., "batch_stats": ...}`` from a torch state_dict.

    ``include_fc=False`` drops the classification head — the frozen-extractor
    configuration (reference feature_extraction.py:210-227 strips ``fc``).
    """
    vit = is_vit_state_dict(state_dict)
    head_prefix = "heads." if vit else "fc."
    variables: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for key, raw in state_dict.items():
        if not include_fc and key.startswith(head_prefix):
            continue
        mapped = vit_torch_key_to_flax(key) if vit else torch_key_to_flax(key)
        if mapped is None:
            continue
        collection, path, leaf = mapped
        convert = _vit_convert_value if vit else _convert_value
        value = convert(key, _to_numpy(raw))
        node = variables[collection]
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = value
    return variables


def _to_numpy(value: Any) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor without importing torch
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def load_torch_checkpoint(path: str, include_fc: bool = True) -> Dict[str, Dict]:
    """Port a ``.pt``/``.pth`` torch checkpoint file (requires torch)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return port_state_dict(state, include_fc=include_fc)


def export_state_dict(variables: Mapping[str, Any]) -> ArrayDict:
    """Inverse port: Flax variable tree → torchvision-style state_dict arrays.

    Used to persist checkpoints at the reference's ``.pt`` artifact paths in
    a torch-loadable layout (values stay numpy; caller may torch.save them).
    Detects the family from the tree (``cls_token`` ⇒ ViT).
    """
    out: ArrayDict = {}
    vit = "cls_token" in variables.get("params", {})
    to_torch = _flax_path_to_torch_vit if vit else _flax_path_to_torch

    def walk(node: Mapping[str, Any], prefix: tuple[str, ...], collection: str):
        for name, value in node.items():
            if isinstance(value, Mapping):
                walk(value, prefix + (name,), collection)
            else:
                out_key = to_torch(prefix + (name,), collection)
                arr = np.asarray(value, dtype=np.float32)
                if out_key.endswith("weight") and arr.ndim == 4:
                    arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
                elif (out_key == "fc.weight") or (vit and arr.ndim == 2):
                    arr = np.transpose(arr, (1, 0))
                out[out_key] = arr

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return out


_VIT_MOD_TO_TORCH = {
    "qkv": "self_attention",  # leaves carry the in_proj_* names
    "out": "self_attention.out_proj",
    "mlp_1": "mlp.0",
    "mlp_2": "mlp.3",
}


def _flax_path_to_torch_vit(path: Sequence[str], collection: str) -> str:
    del collection  # ViT has no batch_stats
    *mods, leaf = path
    if not mods:
        return {"cls_token": "class_token", "pos_embedding": "encoder.pos_embedding"}[leaf]
    head, rest = mods[0], mods[1:]
    if head == "conv_proj":
        return f"conv_proj.{'weight' if leaf == 'kernel' else 'bias'}"
    if head == "fc":
        return f"heads.head.{'weight' if leaf == 'kernel' else 'bias'}"
    if head == "ln":
        return f"encoder.ln.{'weight' if leaf == 'scale' else 'bias'}"
    m = re.match(r"^block(\d+)$", head)
    if m and rest:
        prefix = f"encoder.layers.encoder_layer_{m.group(1)}"
        sub = rest[0]
        if sub in ("ln_1", "ln_2"):
            return f"{prefix}.{sub}.{'weight' if leaf == 'scale' else 'bias'}"
        if sub == "qkv":
            return f"{prefix}.self_attention.in_proj_{'weight' if leaf == 'kernel' else 'bias'}"
        return f"{prefix}.{_VIT_MOD_TO_TORCH[sub]}.{'weight' if leaf == 'kernel' else 'bias'}"
    raise KeyError(f"Unrecognized ViT flax path: {path}")


def _flax_path_to_torch(path: Sequence[str], collection: str) -> str:
    *mods, leaf = path
    leaf_map_bn = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
    leaf_map = {"kernel": "weight", "bias": "bias"}

    parts = []
    is_bn = False
    for mod in mods:
        m = re.match(r"^layer(\d+)_(\d+)$", mod)
        if m:
            parts.append(f"layer{m.group(1)}.{m.group(2)}")
        elif mod == "downsample_conv":
            parts.append("downsample.0")
        elif mod == "downsample_bn":
            parts.append("downsample.1")
            is_bn = True
        else:
            parts.append(mod)
            if mod.startswith("bn"):
                is_bn = True
    torch_leaf = leaf_map_bn[leaf] if (is_bn or leaf in ("scale", "mean", "var")) else leaf_map[leaf]
    return ".".join(parts + [torch_leaf])


def check_weights_match_arch(
    variables: Mapping[str, Any],
    arch: str,
    path: Any,
    env_hint: str = "SSIP_RESNET18_WEIGHTS",
) -> None:
    """Fail clearly when a ported checkpoint's topology is not ``arch``.

    A resnet18 state_dict fed to a resnet50 template would otherwise fail
    deep inside the jitted forward with an opaque flax missing-parameter
    error (e.g. via the weights env default + --arch). Shared by every
    porting call site (extraction and the training pipelines).
    """
    from ssip_tpu.models.resnet import MODEL_STAGES

    params = variables.get("params", {})
    is_vit_ckpt = "cls_token" in params
    if arch.startswith("vit") or is_vit_ckpt:
        from ssip_tpu.models.moe import MOE_CONFIGS
        from ssip_tpu.models.vit import VIT_CONFIGS

        # MOE_CONFIGS carries the same hidden_dim/num_layers keys, so our
        # own saved MoE checkpoints pass the topology check on reload
        # (sweep/predict rebuild from the recorded arch). Dense-vs-MoE is
        # checked explicitly: expert blocks carry a `moe` sub-module where
        # the dense tower has `mlp_1`, so a dense checkpoint cannot load
        # into a vit_moe arch (or vice versa) just because the tower
        # width/depth happens to match.
        cfg = VIT_CONFIGS.get(arch) or MOE_CONFIGS.get(arch)
        hidden = params.get("conv_proj", {}).get("kernel", np.zeros((0,) * 4)).shape[-1]
        blocks = {k for k in params if k.startswith("block")}
        has_moe = any("moe" in params.get(b, {}) for b in blocks)
        ok = (
            cfg is not None
            and is_vit_ckpt
            and hidden == cfg["hidden_dim"]
            and len(blocks) == cfg["num_layers"]
            and has_moe == (arch in MOE_CONFIGS)
        )
        if not ok:
            raise ValueError(
                f"Checkpoint {path} does not match --arch {arch}: "
                f"{'ViT' if is_vit_ckpt else 'ResNet'} checkpoint with "
                f"hidden={hidden or 'n/a'}, {len(blocks)} encoder blocks. "
                f"Point --weights/{env_hint} at a matching state_dict."
            )
        return

    stages = MODEL_STAGES[arch]
    expected = {
        f"layer{s + 1}_{b}" for s in range(len(stages)) for b in range(stages[s])
    }
    got = {k for k in params if k.startswith("layer")}
    # resnet34 and resnet50 share stage sizes; bottleneck blocks are told
    # apart by their third conv
    has_conv3 = "conv3" in params.get("layer1_0", {})
    if got != expected or has_conv3 != (arch == "resnet50"):
        raise ValueError(
            f"Checkpoint {path} does not match --arch {arch}: it has block "
            f"modules {sorted(got)}{' (bottleneck)' if has_conv3 else ''} "
            f"but {arch} expects {sorted(expected)}"
            f"{' (bottleneck)' if arch == 'resnet50' else ''}. "
            f"Point --weights/{env_hint} at a matching state_dict."
        )
