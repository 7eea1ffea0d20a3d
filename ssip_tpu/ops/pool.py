"""Stem max-pool with a fusion-friendly backward.

torchvision's ResNet stem ends in MaxPool2d(3, stride=2, padding=1)
(reference: torch resnet, used by /root/reference/src/feature_extraction.py's
frozen backbone and the training pipelines). The forward is cheap; the
default JAX/XLA *backward* lowers to SelectAndScatter, which runs on the
TPU's scalar path and held ~5% of the fused train step's device time in
the round-3 profile (outputs/notes/profile_train.md).

``stem_max_pool`` keeps the forward bit-identical to ``flax.linen.max_pool``
(it IS a window max over the same -inf-padded windows) while expressing the
backward as nine masked interior-pads that XLA fuses into one elementwise
loop — no SelectAndScatter:

- forward: stack the nine strided window views, take the running max; also
  record ``argmax`` over the stacked axis (first max in row-major window
  order — the same element SelectAndScatter's GE select routes to, and the
  same one torch's MaxPool2d backward picks, so gradients stay bit-identical
  to both; asserted in tests/test_pool.py).
- backward: for each window offset k, scatter ``g * (argmax == k)`` to the
  input grid with ``lax.pad`` (interior=stride-1) — nine pads + adds, all
  fusible elementwise work.

The residual is the uint8 argmax map (window index 0..8), 1 byte per output
element instead of re-reading the activations in the backward.

TPU-only by measured choice, not necessity: the formulation is platform-
neutral XLA, but CPU/GPU keep ``nn.max_pool`` (the project invariant keeps
non-TPU paths on stock XLA ops, and the bit-equality tests compare the two).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_WINDOW = 3
_STRIDE = 2
_PAD = 1
_OFFSETS: Sequence[Tuple[int, int]] = tuple(
    (dy, dx) for dy in range(_WINDOW) for dx in range(_WINDOW)
)


def _window_views(x: jnp.ndarray):
    """The nine [B, Ho, Wo, C] strided views of the -inf-padded input."""
    b, h, w, c = x.shape
    ho = (h + 2 * _PAD - _WINDOW) // _STRIDE + 1
    wo = (w + 2 * _PAD - _WINDOW) // _STRIDE + 1
    xp = jnp.pad(
        x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)),
        constant_values=-jnp.inf,
    )
    return [
        jax.lax.slice(
            xp,
            (0, dy, dx, 0),
            (b, dy + (ho - 1) * _STRIDE + 1, dx + (wo - 1) * _STRIDE + 1, c),
            (1, _STRIDE, _STRIDE, 1),
        )
        for dy, dx in _OFFSETS
    ], ho, wo


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool(x: jnp.ndarray, static) -> jnp.ndarray:
    views, _, _ = _window_views(x)
    out = views[0]
    for v in views[1:]:
        out = jnp.maximum(out, v)
    return out


def _fwd(x: jnp.ndarray, static):
    views, _, _ = _window_views(x)
    stacked = jnp.stack(views, axis=0)  # [9, B, Ho, Wo, C]
    out = jnp.max(stacked, axis=0)
    # argmax returns the FIRST maximal window element (row-major) — the same
    # element SelectAndScatter's GE select and torch's MaxPool2d route to.
    amax = jnp.argmax(stacked, axis=0).astype(jnp.uint8)
    return out, amax


def _bwd(static, amax, g):
    (b, h, w, c), x_dtype = static
    _, ho, wo, _ = g.shape
    hp, wp = h + 2 * _PAD, w + 2 * _PAD
    span_h = (ho - 1) * _STRIDE + 1
    span_w = (wo - 1) * _STRIDE + 1
    gi = jnp.zeros((b, hp, wp, c), g.dtype)
    for k, (dy, dx) in enumerate(_OFFSETS):
        contrib = jnp.where(amax == k, g, jnp.zeros_like(g))
        gi = gi + jax.lax.pad(
            contrib,
            jnp.zeros((), g.dtype),
            (
                (0, 0, 0),
                (dy, hp - dy - span_h, _STRIDE - 1),
                (dx, wp - dx - span_w, _STRIDE - 1),
                (0, 0, 0),
            ),
        )
    return (gi[:, _PAD:_PAD + h, _PAD:_PAD + w, :].astype(x_dtype),)


_pool.defvjp(_fwd, _bwd)


def _max_pool_custom(x: jnp.ndarray) -> jnp.ndarray:
    """The custom-backward pool, UNGATED — callers want ``stem_max_pool``."""
    return _pool(x, (tuple(x.shape), x.dtype))


# Tests may set this to True/False to override the backend gate (the custom
# backward normally runs only on TPU, so CPU integration tests force it on).
_FORCE_CUSTOM: bool | None = None


def stem_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: fusion-friendly backward on TPU, stock XLA elsewhere."""
    import os

    import flax.linen as nn

    # Default is stock XLA SelectAndScatter: the argmax-pads backward looked
    # fusion-friendly but LOSES the fused train step (bf16 batch-128 v5e
    # ablation 2026-08-19: custom 16.5 steps/s vs XLA 21.5 with the blocked
    # rotation on; the all-XLA step runs 47.9). SSIP_POOL_FUSED_BWD=1 opts in.
    use_custom = (
        _FORCE_CUSTOM
        if _FORCE_CUSTOM is not None
        else (
            jax.default_backend() == "tpu"
            and os.environ.get("SSIP_POOL_FUSED_BWD", "0") == "1"
        )
    )
    if use_custom:
        return _max_pool_custom(x)
    return nn.max_pool(
        x, window_shape=(_WINDOW, _WINDOW), strides=(_STRIDE, _STRIDE),
        padding=[(_PAD, _PAD), (_PAD, _PAD)],
    )
