"""Fused LayerNorm (ops/layernorm.py) and packed-qkv attention kernels.

The LN kernel must equal the XLA reference (itself torch-oracle-pinned)
for values and gradients, in f32 and bf16, including the final partial
row block the grid masking covers. The packed-qkv attention must equal
the unpack→attention_xla→repack reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ssip_tpu.ops.attention import attention_qkv_xla, fused_attention_qkv
from ssip_tpu.ops.layernorm import _ROW_BLOCK, layer_norm, layer_norm_xla


class TestLayerNormXLA:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(7, 33, 192)).astype(np.float32) * 3.0
        s = rng.normal(size=(192,)).astype(np.float32)
        b = rng.normal(size=(192,)).astype(np.float32)
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (192,), torch.from_numpy(s),
            torch.from_numpy(b), eps=1e-6,
        ).numpy()
        got = np.asarray(
            layer_norm_xla(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 1e-6)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestLayerNormPallas:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize(
        "rows", [_ROW_BLOCK, _ROW_BLOCK - 1, 3 * _ROW_BLOCK + 17, 5]
    )
    def test_forward_matches_xla(self, dtype, rows):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(rows, 256)), dtype)
        s = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
        ref = layer_norm_xla(x, s, b, 1e-6)
        got = layer_norm(x, s, b, eps=1e-6, interpret=True)
        assert got.dtype == x.dtype
        tol = 1e-6 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=tol, atol=tol,
        )

    def test_gradients_match_xla(self):
        """Partial-block masking matters here: unmasked garbage rows would
        contaminate the dscale/dbias partial sums."""
        rng = np.random.default_rng(2)
        rows = _ROW_BLOCK + 37  # forces a masked final block
        x = jnp.asarray(rng.normal(size=(rows, 192)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(192,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(192,)).astype(np.float32))

        def loss(fn):
            return lambda *a: jnp.sum(jnp.sin(fn(*a)))

        g_ref = jax.grad(
            loss(lambda x, s, b: layer_norm_xla(x, s, b, 1e-6)),
            argnums=(0, 1, 2),
        )(x, s, b)
        g_got = jax.grad(
            loss(lambda x, s, b: layer_norm(x, s, b, eps=1e-6, interpret=True)),
            argnums=(0, 1, 2),
        )(x, s, b)
        for name, a, c in zip("x/scale/bias".split("/"), g_ref, g_got):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad {name}",
            )

    def test_gradients_at_non_divisible_block_count(self):
        """Regression: a (1, D) partials block over a [blocks, D] array is
        illegal in Mosaic whenever ``blocks`` is not a multiple of 8 (first
        hit by the ViT-S/16 train step: 128·197 rows → 99 blocks). The
        partials are now one full-array block with per-step row writes;
        this exercises that shape class (round-4 fix, validated on TPU at
        the exact 25216×384 failing shape)."""
        rng = np.random.default_rng(7)
        rows = 9 * _ROW_BLOCK + 5  # 10 blocks... any non-multiple-of-8 count
        x = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        g_ref = jax.grad(
            lambda x, s, b: jnp.sum(jnp.sin(layer_norm_xla(x, s, b, 1e-6))),
            argnums=(0, 1, 2),
        )(x, s, b)
        g_got = jax.grad(
            lambda x, s, b: jnp.sum(
                jnp.sin(layer_norm(x, s, b, eps=1e-6, interpret=True))
            ),
            argnums=(0, 1, 2),
        )(x, s, b)
        for name, a, c in zip("x/scale/bias".split("/"), g_ref, g_got):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad {name}",
            )

    def test_3d_input_round_trips_shape(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 197, 384)).astype(np.float32))
        s = jnp.ones(384, jnp.float32)
        b = jnp.zeros(384, jnp.float32)
        got = layer_norm(x, s, b, eps=1e-6, interpret=True)
        assert got.shape == x.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(layer_norm_xla(x, s, b, 1e-6)),
            rtol=1e-5, atol=1e-5,
        )


class TestFusedLayerNormModule:
    def test_param_tree_matches_nn_layernorm(self):
        import flax.linen as nn

        from ssip_tpu.models.vit import FusedLayerNorm

        x = jnp.ones((2, 8), jnp.float32)
        v_new = FusedLayerNorm().init(jax.random.key(0), x)
        v_old = nn.LayerNorm(epsilon=1e-6).init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v_new) == jax.tree_util.tree_structure(v_old)
        got = FusedLayerNorm().apply(v_new, x)
        ref = nn.LayerNorm(epsilon=1e-6).apply(v_old, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


class TestPackedQKVAttention:
    def test_xla_path_matches_unpacked(self):
        from ssip_tpu.ops.attention import attention_xla

        rng = np.random.default_rng(4)
        B, S, H, Dh = 2, 29, 3, 16
        qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * Dh)).astype(np.float32))
        parts = qkv.reshape(B, S, 3, H, Dh)
        q, k, v = (jnp.transpose(parts[:, :, i], (0, 2, 1, 3)) for i in range(3))
        ref = jnp.transpose(attention_xla(q, k, v), (0, 2, 1, 3)).reshape(B, S, -1)
        got = attention_qkv_xla(qkv, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_pallas_interpret_matches_xla(self):
        rng = np.random.default_rng(5)
        B, S, H, Dh = 2, 197, 3, 64  # the real (non-128-aligned) ViT S
        qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * Dh)).astype(np.float32))
        ref = attention_qkv_xla(qkv, H)
        got = fused_attention_qkv(qkv, H, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_pallas_interpret_grads_match_xla(self):
        rng = np.random.default_rng(6)
        B, S, H, Dh = 1, 33, 2, 32
        qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * Dh)).astype(np.float32))
        g_ref = jax.grad(lambda q: jnp.sum(jnp.cos(attention_qkv_xla(q, H))))(qkv)
        g_got = jax.grad(
            lambda q: jnp.sum(jnp.cos(fused_attention_qkv(q, H, interpret=True)))
        )(qkv)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )
