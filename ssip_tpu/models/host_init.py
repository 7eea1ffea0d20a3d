"""Device-free seeded initialization.

``model.init`` is a full XLA compile+run; on a contended remote TPU that can
cost minutes for zero benefit when the weights are an explicitly *random*
fallback. This builds the same variable tree on the host with numpy:
variance-scaled normals for conv/dense kernels (fan-in), ones/zeros for BN —
deterministic in (seed, parameter path), instant, and device-independent.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _path_seed(seed: int, path: tuple) -> np.random.Generator:
    name = "/".join(str(p) for p in path)
    digest = hashlib.sha256(f"{seed}:{name}".encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def seeded_init_host(model, seed: int, input_shape=(1, 224, 224, 3)) -> Dict[str, Any]:
    """Variable tree matching ``model.init`` structure, built host-side."""
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros(input_shape, jnp.float32), train=False
        )
    )
    # drop transient collections (MoE "aux" losses): they are per-forward
    # outputs, not state — materializing them would leak stale zeros into
    # checkpoints and double-count under apply(mutable=["aux"])
    shapes = {k: v for k, v in dict(shapes).items() if k != "aux"}

    def materialize(path, leaf):
        rng = _path_seed(seed, path)
        shape = tuple(leaf.shape)
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "kernel":
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            std = float(np.sqrt(1.0 / max(fan_in, 1)))
            return rng.normal(0.0, std, size=shape).astype(np.float32)
        if name == "pos_embedding":  # ViT: torch inits normal(std=0.02)
            return rng.normal(0.0, 0.02, size=shape).astype(np.float32)
        if name in ("w_in", "w_out"):  # MoE expert kernels [E, in, out]:
            # fan from the per-expert (in, out) axes — the leading expert
            # axis is a batch axis (models/moe.py:_expert_init)
            std = float(np.sqrt(1.0 / max(shape[-2], 1)))
            return rng.normal(0.0, std, size=shape).astype(np.float32)
        if name in ("scale", "var"):
            return np.ones(shape, np.float32)
        return np.zeros(shape, np.float32)  # bias, mean, cls_token

    return jax.tree_util.tree_map_with_path(materialize, shapes)
