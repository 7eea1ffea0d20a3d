"""Seeded PRNG discipline.

The reference seeds four global RNGs (reference: src/training/common.py:87-93).
JAX's functional PRNG replaces that with explicit key threading; this module
gives every subsystem a *named* fold of one root key so that adding a new
consumer never perturbs existing streams, plus a seeded numpy Generator for
host-side decisions (splits, samplers) that must be reproducible but never
touch the device.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def _name_to_int(name: str) -> int:
    digest = hashlib.sha256(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little")


def named_key(seed: int, name: str) -> jax.Array:
    """A key unique to (seed, name); stable across code changes elsewhere."""
    return jax.random.fold_in(root_key(seed), _name_to_int(name))


def epoch_key(seed: int, name: str, epoch: int) -> jax.Array:
    return jax.random.fold_in(named_key(seed, name), epoch)


def host_rng(seed: int, name: str) -> np.random.Generator:
    """Seeded numpy Generator for host-side (non-device) randomness."""
    return np.random.default_rng(np.random.SeedSequence([seed, _name_to_int(name)]))
