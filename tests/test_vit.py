"""ViT family: torch-oracle parity, fused attention, porting, training.

The oracle replicates torchvision's ``VisionTransformer`` topology and
state_dict key layout locally (torchvision is not installed here), down to
``nn.MultiheadAttention``'s stacked in_proj and the Sequential MLP indices —
so the parity below covers both the math and the real checkpoint porting
path. The reference has no ViT (its model surface is resnet18, reference
src/training/common.py:299-304); this family is a TPU extra.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.port_torch import (
    check_weights_match_arch,
    export_state_dict,
    port_state_dict,
)
from ssip_tpu.models.vit import VIT_CONFIGS, VisionTransformer
from ssip_tpu.ops.attention import attention_xla, fused_attention

# small-but-real dims: 2 blocks, 4 heads of 16, 32x32/patch16 -> 5 tokens
TINY = dict(patch_size=16, hidden_dim=64, num_layers=2, num_heads=4, mlp_dim=128)
IMG = 32


class TorchEncoderBlock(tnn.Module):
    def __init__(self, d, heads, mlp):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d, eps=1e-6)
        self.self_attention = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(d, eps=1e-6)
        # torchvision MLPBlock serializes as Sequential indices 0/3
        self.mlp = tnn.Sequential(
            tnn.Linear(d, mlp), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(mlp, d), tnn.Dropout(0.0),
        )

    def forward(self, inp):
        x, _ = self.self_attention(
            self.ln_1(inp), self.ln_1(inp), self.ln_1(inp), need_weights=False
        )
        x = x + inp
        return x + self.mlp(self.ln_2(x))


class TorchViT(tnn.Module):
    """torchvision vision_transformer.VisionTransformer, written locally."""

    def __init__(self, image_size, patch, d, layers, heads, mlp, num_classes):
        super().__init__()
        self.conv_proj = tnn.Conv2d(3, d, patch, stride=patch)
        self.class_token = tnn.Parameter(torch.zeros(1, 1, d))
        seq = (image_size // patch) ** 2 + 1
        self.encoder = tnn.Module()
        self.encoder.pos_embedding = tnn.Parameter(
            torch.empty(1, seq, d).normal_(std=0.02)
        )
        self.encoder.layers = tnn.Sequential(
            OrderedDict(
                (f"encoder_layer_{i}", TorchEncoderBlock(d, heads, mlp))
                for i in range(layers)
            )
        )
        self.encoder.ln = tnn.LayerNorm(d, eps=1e-6)
        self.heads = tnn.Sequential(
            OrderedDict(head=tnn.Linear(d, num_classes))
        )

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x)  # [N, D, h, w]
        x = x.reshape(n, x.shape[1], -1).permute(0, 2, 1)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
        x = x + self.encoder.pos_embedding
        x = self.encoder.ln(self.encoder.layers(x))
        feats = x[:, 0]
        return self.heads(feats), feats


def _tiny_pair(num_classes=2, seed=0):
    torch.manual_seed(seed)
    oracle = TorchViT(
        IMG, TINY["patch_size"], TINY["hidden_dim"], TINY["num_layers"],
        TINY["num_heads"], TINY["mlp_dim"], num_classes,
    ).eval()
    # perturb the zero-init class token so it actually participates
    with torch.no_grad():
        oracle.class_token.normal_(std=0.05)
    model = VisionTransformer(num_classes=num_classes, **TINY)
    variables = port_state_dict(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    return oracle, model, {"params": variables["params"]}


def test_vit_matches_torch_oracle():
    oracle, model, variables = _tiny_pair()
    x = np.random.default_rng(1).normal(size=(4, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_feats = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    logits, feats = model.apply(
        variables, jnp.asarray(x), train=False, return_features=True
    )
    np.testing.assert_allclose(feats, t_feats.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(logits, t_logits.numpy(), atol=2e-5, rtol=1e-4)


def test_vit_feature_head_matches_classifier_features():
    oracle, model, variables = _tiny_pair()
    extractor = VisionTransformer(num_classes=None, **TINY)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, IMG, IMG, 3)), jnp.float32
    )
    feats = extractor.apply(
        {"params": {k: v for k, v in variables["params"].items() if k != "fc"}}, x
    )
    _, feats_cls = model.apply(variables, x, train=False, return_features=True)
    np.testing.assert_allclose(feats, feats_cls, atol=1e-6)


def test_vit_export_port_roundtrip():
    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 3, (1, IMG, IMG, 3))
    sd = export_state_dict(variables)
    assert "class_token" in sd and "heads.head.weight" in sd
    assert "encoder.layers.encoder_layer_0.self_attention.in_proj_weight" in sd
    back = port_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    for path, leaf in flat_a:
        node = back["params"]
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)


def test_vit_accepts_legacy_mlp_linear_names():
    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 4, (1, IMG, IMG, 3))
    sd = export_state_dict(variables)
    legacy = {
        k.replace(".mlp.0.", ".mlp.linear_1.").replace(".mlp.3.", ".mlp.linear_2."): v
        for k, v in sd.items()
    }
    back = port_state_dict(legacy)
    np.testing.assert_array_equal(
        back["params"]["block0"]["mlp_1"]["kernel"],
        np.asarray(variables["params"]["block0"]["mlp_1"]["kernel"]),
    )


def test_check_weights_match_arch_vit():
    model = MODEL_FACTORIES["vit_t16"](num_classes=None)
    variables = seeded_init_host(model, 5, (1, IMG, IMG, 3))
    check_weights_match_arch(variables, "vit_t16", "x.pt")
    with pytest.raises(ValueError, match="does not match"):
        check_weights_match_arch(variables, "vit_b16", "x.pt")  # wrong hidden
    with pytest.raises(ValueError, match="does not match"):
        check_weights_match_arch(variables, "resnet18", "x.pt")  # wrong family
    res = seeded_init_host(MODEL_FACTORIES["resnet18"](), 0, (1, 32, 32, 3))
    with pytest.raises(ValueError, match="does not match"):
        check_weights_match_arch(res, "vit_t16", "x.pt")


def test_fused_attention_xla_equals_oracle_softmax():
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32) for _ in range(3)
    )
    out = attention_xla(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    p = torch.softmax(torch.from_numpy(np.asarray(s)), dim=-1).numpy()
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_attention_pallas_interpret_matches_xla():
    rng = np.random.default_rng(8)
    # 197 = the real ViT-224 sequence; exercises the pad-to-128 masking
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2, 197, 16)), jnp.float32)
        for _ in range(3)
    )
    fused = fused_attention(q, k, v, interpret=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(fused, ref, atol=1e-5, rtol=1e-5)


def test_fused_attention_pallas_interpret_grads_match_xla():
    # pallas_call has no autodiff rule — the custom VJP (Pallas backward
    # kernel, ops/attention.py:_attn_bwd_kernel) is what makes ViT/MoE
    # TRAINING on TPU possible at all; assert it against jax.grad through
    # the XLA path, including the pad-to-128 key masking at S=197.
    rng = np.random.default_rng(11)
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2, 197, 16)), jnp.float32)
        for _ in range(3)
    )
    cot = jnp.asarray(rng.normal(size=(1, 2, 197, 16)), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * cot)

    got = jax.grad(
        lambda q, k, v: loss(
            lambda *a: fused_attention(*a, interpret=True), q, k, v
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref = jax.grad(
        lambda q, k, v: loss(attention_xla, q, k, v), argnums=(0, 1, 2)
    )(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=1e-4, err_msg=name)


def test_vit_trains_and_freezes_backbone():
    from ssip_tpu.train.engine import (
        DeviceDataset, TrainState, make_optimizer, train_model,
    )

    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 6, (1, IMG, IMG, 3))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], batch_stats={},
        tx=make_optimizer(1e-3, 1e-4),
    )
    rng = np.random.default_rng(9)
    ds = DeviceDataset.create(
        jnp.asarray(rng.integers(0, 255, (16, IMG, IMG, 3), dtype=np.uint8)),
        (np.arange(16) % 2).astype(np.int64),
    )
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: str(getattr(path[0], "key", path[0])) == "fc",
        state.params,
    )
    new_state, history = train_model(
        state, ds, ds, num_epochs=2, batch_size=8, seed=0,
        stream_name="vit_test", trainable_mask=mask,
    )
    assert all(np.isfinite(history["train_loss"]))
    # frozen backbone is bit-identical; the fc head moved
    np.testing.assert_array_equal(
        np.asarray(new_state.params["block0"]["qkv"]["kernel"]),
        np.asarray(state.params["block0"]["qkv"]["kernel"]),
    )
    assert not np.array_equal(
        np.asarray(new_state.params["fc"]["kernel"]),
        np.asarray(state.params["fc"]["kernel"]),
    )


def test_vit_remat_matches_plain():
    """--remat (jax.checkpoint per encoder block) changes memory, not math:
    one optimizer step agrees with the plain model to fp exactness."""
    import optax
    from ssip_tpu.train.engine import TrainState, make_train_step

    plain = MODEL_FACTORIES["vit_t16"](num_classes=2)
    rem = MODEL_FACTORIES["vit_t16"](num_classes=2, remat=True)
    variables = seeded_init_host(plain, 13, (1, IMG, IMG, 3))
    # identical param tree structure — checkpoints swap freely
    assert jax.tree_util.tree_structure(
        seeded_init_host(rem, 13, (1, IMG, IMG, 3))
    ) == jax.tree_util.tree_structure(variables)

    rng = np.random.default_rng(14)
    images = jnp.asarray(rng.integers(0, 255, (4, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(4) % 2, jnp.int32)
    valid = jnp.ones(4, bool)
    step = make_train_step(augment=False)

    outs = {}
    for name, model in (("plain", plain), ("remat", rem)):
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats={}, tx=optax.sgd(1e-2),
        )
        new_state, loss, _ = step(state, images, labels, valid, jax.random.key(0))
        outs[name] = (float(loss), new_state.params)
    assert outs["plain"][0] == outs["remat"][0]
    for a, b in zip(
        jax.tree_util.tree_leaves(outs["plain"][1]),
        jax.tree_util.tree_leaves(outs["remat"][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_run_eval_epoch_accepts_statless_variable_dict():
    """Raw {"params": ...} dicts (ViT checkpoints) evaluate without a
    batch_stats key — the threshold-sweep path loads exactly this shape."""
    from ssip_tpu.train.engine import DeviceDataset, run_eval_epoch

    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 11, (1, IMG, IMG, 3))
    rng = np.random.default_rng(12)
    ds = DeviceDataset.create(
        jnp.asarray(rng.integers(0, 255, (6, IMG, IMG, 3), dtype=np.uint8)),
        (np.arange(6) % 2).astype(np.int64),
    )
    loss, y_true, y_pred, y_prob = run_eval_epoch(
        {"params": variables["params"]}, ds, batch_size=4,
        apply_fn=model.apply,
    )
    assert np.isfinite(loss) and y_prob.shape == (6, 2)


def test_sweep_honors_recorded_image_size():
    from ssip_tpu.pipelines.sweep import image_size_of

    assert image_size_of({"image_size": 32}, 224) == 32
    assert image_size_of({}, 224) == 224  # pre-image_size histories


def test_vit_tensor_parallel_step_matches_single_device():
    """One AdamW step on a 4x2 data×model mesh == the unsharded step.

    Exercises the Megatron-style qkv/mlp column/row rules in
    parallel.mesh.tp_param_spec end-to-end through the real train step.
    """
    import optax
    from jax.sharding import Mesh
    from ssip_tpu.parallel.mesh import tree_shardings
    from ssip_tpu.train.engine import TrainState, make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")

    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 7, (1, IMG, IMG, 3))

    def fresh_state():
        # SGD, like the ResNet TP test: Adam's g/√(g²) amplifies fp
        # reduction-order noise at g≈0 to O(lr), making param-level
        # exactness unassertable; SGD keeps sharding noise at ~1e-7
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"], batch_stats={},
            tx=optax.sgd(1e-2),
        )

    rng = np.random.default_rng(10)
    images = jnp.asarray(rng.integers(0, 255, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(8) % 2, jnp.int32)
    valid = jnp.ones(8, bool)
    key = jax.random.key(0)

    step = make_train_step(augment=False)
    ref_state, ref_loss, _ = step(fresh_state(), images, labels, valid, key)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sharded = fresh_state()
    sharded = jax.device_put(sharded, tree_shardings(mesh, sharded))
    tp_state, tp_loss, _ = step(sharded, images, labels, valid, key)

    np.testing.assert_allclose(float(tp_loss), float(ref_loss), atol=1e-5)
    # the Megatron rules actually sharded the encoder
    qkv_spec = str(tp_state.params["block0"]["qkv"]["kernel"].sharding.spec)
    assert "model" in qkv_spec, qkv_spec
    a = jax.tree_util.tree_leaves(ref_state.params)
    b = jax.tree_util.tree_leaves(tp_state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_fused_attention_qkv_kv_len_masks_pad_keys():
    """The flat-stream layout (models/vit.py) pads S 197→208 and relies on
    kv_len masking: masked keys' probabilities underflow to exactly 0.0,
    so real rows match the unpadded kernel to fp-reduction-order tolerance
    (the PV dot groups its sum differently over 208 vs 197 terms), and
    garbage pad rows must stay finite."""
    from ssip_tpu.ops.attention import fused_attention_qkv

    rng = np.random.default_rng(13)
    s, s_pad, d, heads = 197, 208, 32, 2
    qkv = rng.normal(size=(2, s_pad, 3 * d)).astype(np.float32)
    qkv[:, s:] = 7.7  # garbage pad rows — must not leak into real rows

    padded = fused_attention_qkv(
        jnp.asarray(qkv), heads, kv_len=s, interpret=True
    )
    exact = fused_attention_qkv(jnp.asarray(qkv[:, :s]), heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(padded[:, :s]), np.asarray(exact), atol=1e-6, rtol=1e-5
    )
    assert np.isfinite(np.asarray(padded)).all()


def test_fused_attention_qkv_kv_len_grads_match_unpadded():
    """Backward through the padded kernel: real-row gradients must match
    the unpadded kernel's, pad-KEY rows must receive zero gradient when
    the cotangent is zero on pad rows (the flat ViT's situation — the
    loss never reads pad rows)."""
    from ssip_tpu.ops.attention import fused_attention_qkv

    rng = np.random.default_rng(17)
    s, s_pad, d, heads = 21, 32, 16, 2
    qkv = jnp.asarray(rng.normal(size=(1, s_pad, 3 * d)), jnp.float32)
    cot = np.zeros((1, s_pad, d), np.float32)
    cot[:, :s] = rng.normal(size=(1, s, d))
    cot = jnp.asarray(cot)

    g_pad = jax.grad(
        lambda x: jnp.sum(
            fused_attention_qkv(x, heads, kv_len=s, interpret=True) * cot
        )
    )(qkv)
    g_exact = jax.grad(
        lambda x: jnp.sum(
            fused_attention_qkv(x, heads, interpret=True) * cot[:, :s]
        )
    )(qkv[:, :s])
    np.testing.assert_allclose(
        np.asarray(g_pad[:, :s]), np.asarray(g_exact), atol=2e-6, rtol=1e-5
    )
    # pad rows: zero dq (cotangent is zero there), zero dk/dv (masked keys)
    np.testing.assert_array_equal(np.asarray(g_pad[:, s:]), 0.0)


def test_vit_flat_stream_matches_legacy_block_layout():
    """The flat [B·S_pad, D] encoder must reproduce the 3-D per-block
    layout to fp-reduction tolerance (same row math, pad rows discarded;
    only dot-sum grouping differs)."""
    model = MODEL_FACTORIES["vit_t16"](num_classes=None)
    v = seeded_init_host(model, 3, (1, 32, 32, 3))
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    flat = model.apply(v, x)

    # legacy composition: run the same params through 3-D EncoderBlocks
    from ssip_tpu.models.vit import EncoderBlock, FusedLayerNorm, VIT_CONFIGS

    cfg = VIT_CONFIGS["vit_t16"]
    p = v["params"]
    import flax.linen as nn

    h = jax.lax.conv_general_dilated(
        x, p["conv_proj"]["kernel"], (16, 16), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv_proj"]["bias"]
    h = h.reshape(2, -1, cfg["hidden_dim"])
    cls = jnp.broadcast_to(p["cls_token"], (2, 1, cfg["hidden_dim"]))
    h = jnp.concatenate([cls, h], axis=1) + p["pos_embedding"]
    for i in range(cfg["num_layers"]):
        blk = EncoderBlock(
            num_heads=cfg["num_heads"], mlp_dim=cfg["mlp_dim"]
        )
        h = blk.apply({"params": p[f"block{i}"]}, h)
    ref = FusedLayerNorm(out_dtype=jnp.float32).apply(
        {"params": p["ln"]}, h[:, 0].astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(ref), atol=5e-6, rtol=1e-4
    )
