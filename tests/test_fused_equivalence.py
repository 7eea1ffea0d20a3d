"""Fused-epoch scan must reproduce the per-step path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.runtime.prng import epoch_key
from ssip_tpu.train.engine import (
    TrainState,
    _stacked_epoch,
    make_fused_epoch,
    make_optimizer,
    make_train_step,
)

IMG = 32


def _fresh_state():
    model = ResNet18(num_classes=2)
    variables = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(1e-3, 1e-4),
    )


def test_fused_epoch_matches_per_step():
    rng = np.random.default_rng(0)
    n, batch = 12, 4
    images = jnp.asarray(rng.integers(0, 256, (n, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    order = rng.permutation(n)
    pidx, valid = _stacked_epoch(order, batch)
    keys = [epoch_key(42, "eq/aug/0", bi) for bi in range(pidx.shape[0])]

    # per-step path
    state_a = _fresh_state()
    step = make_train_step(augment=True)
    losses_a = []
    for bi in range(pidx.shape[0]):
        state_a, loss, _ = step(
            state_a,
            images[jnp.asarray(pidx[bi])],
            labels[jnp.asarray(pidx[bi])],
            jnp.asarray(valid[bi]),
            keys[bi],
        )
        losses_a.append(float(loss))

    # fused path
    state_b = _fresh_state()
    fused = make_fused_epoch(augment=True)
    state_b, losses_b, _ = fused(
        state_b,
        images[jnp.asarray(pidx)],
        labels[jnp.asarray(pidx)],
        jnp.asarray(valid),
        jnp.stack(keys),
    )

    # The FORWARD path is bit-identical between the two programs by
    # construction (fixed-point rotation index map, fusion-invariant affine
    # normalize — ops/augment.py, ops/resize.py), so step 0, computed from
    # identical states, must agree exactly.
    assert losses_a[0] == float(np.asarray(losses_b)[0])

    # The BACKWARD pass is a different story: scan-body and standalone
    # programs fuse the conv/BN gradients differently, so grads differ in
    # the last ulp, and Adam's eps-normalized first step amplifies that on
    # near-zero-gradient elements (measured: step-0 param updates differ by
    # up to ~1e-4 abs between the two programs, losses by ~1e-3 rel after
    # 3 steps). Assert the trajectory within that measured envelope — wrong
    # key order / masking / optimizer sequencing all produce O(1) errors.
    np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state_a.params["fc"]["kernel"]),
        np.asarray(state_b.params["fc"]["kernel"]),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(state_a.batch_stats["bn1"]["mean"]),
        np.asarray(state_b.batch_stats["bn1"]["mean"]),
        rtol=1e-3, atol=1e-4,
    )
