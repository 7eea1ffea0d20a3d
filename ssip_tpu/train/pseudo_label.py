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


def pool_probabilities(
    apply_fn, variables, pool_images_u8: jax.Array, batch_size: int,
    mesh=None,
) -> np.ndarray:
    """Softmax probabilities [N, C] over a device-resident pool.

    The whole pool runs as ONE fused dispatch: pad to a batch multiple,
    reshape to [steps, batch, ...], scan the eval forward. With ``mesh``,
    each step's batch axis shards over the data axis (params replicated) —
    the two full-pool inference passes (pseudo-labeling, triage) are the
    semi pipeline's biggest single dispatches and scale with the mesh like
    the train/eval epochs do.
    """

    @jax.jit
    def probs_all(images, variables):
        def step(_, u8):
            x = eval_preprocess(u8)
            return None, jax.nn.softmax(apply_fn(variables, x, train=False), axis=1)

        _, probs = jax.lax.scan(step, None, images)
        return probs

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    else:
        variables = jax.device_put(variables)
    n = int(pool_images_u8.shape[0])
    if n == 0:
        # the clamp-pad index below would be -1 and the final reshape(0, -1)
        # raises an obscure numpy error; an empty pool is a valid API input
        # (pipeline callers fail-fast earlier with their own messages)
        probe = jax.eval_shape(  # probe the head for the class count
            lambda v: apply_fn(v, jnp.zeros((1, *pool_images_u8.shape[1:]),
                                            pool_images_u8.dtype), train=False),
            variables,
        )
        num_classes = probe.shape[-1]
        return np.zeros((0, num_classes), np.float32)
    if mesh is not None:
        from ssip_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple

        batch_size = pad_to_multiple(batch_size, mesh.shape[DATA_AXIS])
    steps = (n + batch_size - 1) // batch_size
    padded = steps * batch_size
    idx = jnp.asarray(np.minimum(np.arange(padded), n - 1))  # clamp-pad
    images = pool_images_u8[idx].reshape(steps, batch_size, *pool_images_u8.shape[1:])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        images = jax.device_put(images, NamedSharding(mesh, P(None, "data")))
    probs = np.asarray(probs_all(images, variables))
    return probs.reshape(padded, -1)[:n]


def generate_pseudo_labels(
    apply_fn,
    variables,
    pool_images_u8: jax.Array,
    batch_size: int,
    confidence_threshold: float,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(kept_indices, labels, confidences) over the pool, in pool order."""
    probs = pool_probabilities(
        apply_fn, variables, pool_images_u8, batch_size, mesh=mesh
    )
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    keep = np.nonzero(conf >= confidence_threshold)[0]
    return keep, pred[keep], conf[keep]
