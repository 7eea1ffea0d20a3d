"""Pseudo-label generation for the weak (unlabeled) pool.

Semantics: reference semi_supervised.py:44-72 — softmax the baseline model
over the pool; keep samples whose max-class confidence ≥ threshold, labeled
with the argmax class. Runs as batched jitted inference over the
device-resident pool; selection happens host-side (data-dependent size).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.ops.augment import eval_preprocess


def generate_pseudo_labels(
    apply_fn,
    variables,
    pool_images_u8: jax.Array,
    batch_size: int,
    confidence_threshold: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(kept_indices, labels, confidences) over the pool, in pool order."""

    @jax.jit
    def probs_step(u8, variables):
        x = eval_preprocess(u8)
        logits = apply_fn(variables, x, train=False)
        return jax.nn.softmax(logits, axis=1)

    variables = jax.device_put(variables)
    n = int(pool_images_u8.shape[0])
    confs: List[np.ndarray] = []
    preds: List[np.ndarray] = []
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        pidx = np.concatenate([idx, np.zeros(batch_size - len(idx), idx.dtype)]) \
            if len(idx) < batch_size else idx
        p = np.asarray(probs_step(pool_images_u8[jnp.asarray(pidx)], variables))[: len(idx)]
        confs.append(p.max(axis=1))
        preds.append(p.argmax(axis=1))
    conf = np.concatenate(confs)
    pred = np.concatenate(preds)
    keep = np.nonzero(conf >= confidence_threshold)[0]
    return keep, pred[keep], conf[keep]
