"""Space-to-depth stem reparametrization (models/resnet.py:StemConv).

The s2d path must be the SAME arithmetic as the direct 7×7/2 conv —
re-associated only — for values and gradients, with the parameter tree
(torchvision ``conv1/kernel`` shape) unchanged. End-to-end torch parity is
covered by tests/test_resnet_parity.py, which runs with s2d default-on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.resnet import StemConv


def _stem_outputs(monkeypatch, x, enabled):
    monkeypatch.setenv("SSIP_S2D_STEM", "1" if enabled else "0")
    module = StemConv(64)
    variables = module.init(jax.random.key(0), x)
    return module, variables


class TestS2DStem:
    def test_matches_direct_conv_values(self, monkeypatch):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
        module, variables = _stem_outputs(monkeypatch, x, enabled=False)
        direct = module.apply(variables, x)
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        s2d = module.apply(variables, x)
        assert direct.shape == s2d.shape == (2, 16, 24, 64)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(s2d), rtol=1e-5, atol=1e-5
        )

    def test_matches_direct_conv_gradients(self, monkeypatch):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
        module, variables = _stem_outputs(monkeypatch, x, enabled=False)
        cot = jnp.asarray(rng.normal(size=(1, 14, 14, 64)).astype(np.float32))

        def scalar(v, inp):
            return jnp.sum(module.apply(v, inp) * cot)

        monkeypatch.setenv("SSIP_S2D_STEM", "0")
        gk_direct, gx_direct = jax.grad(scalar, argnums=(0, 1))(variables, x)
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        gk_s2d, gx_s2d = jax.grad(scalar, argnums=(0, 1))(variables, x)
        np.testing.assert_allclose(
            np.asarray(gk_direct["params"]["kernel"]),
            np.asarray(gk_s2d["params"]["kernel"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gx_direct), np.asarray(gx_s2d), rtol=1e-4, atol=1e-5
        )

    def test_odd_spatial_falls_back(self, monkeypatch):
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        x = jnp.zeros((1, 31, 33, 3), jnp.float32)
        module = StemConv(64)
        variables = module.init(jax.random.key(0), x)
        # ceil(31/2), ceil(33/2) — stock strided-conv output arithmetic
        assert module.apply(variables, x).shape == (1, 16, 17, 64)

    def test_param_tree_is_torchvision_shaped(self):
        variables = seeded_init_host(ResNet18(num_classes=2), 0, (1, 32, 32, 3))
        kernel = variables["params"]["conv1"]["kernel"]
        assert kernel.shape == (7, 7, 3, 64)

    def test_default_scope_is_train_only(self, monkeypatch):
        """Inference measured s2d as a loss on v5e (models/inference.py:25-32)."""
        from ssip_tpu.models.resnet import _s2d_stem_enabled

        monkeypatch.delenv("SSIP_S2D_STEM", raising=False)
        assert _s2d_stem_enabled(train=True) is True
        assert _s2d_stem_enabled(train=False) is False
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        assert _s2d_stem_enabled(train=False) is True
        monkeypatch.setenv("SSIP_S2D_STEM", "0")
        assert _s2d_stem_enabled(train=True) is False

    def test_seeded_init_invariant_to_flag(self, monkeypatch):
        """Init draws come from the param path, not the apply schedule."""
        kernels = {}
        for enabled in ("0", "1"):
            monkeypatch.setenv("SSIP_S2D_STEM", enabled)
            variables = seeded_init_host(
                ResNet18(num_classes=2), 0, (1, 32, 32, 3)
            )
            kernels[enabled] = np.asarray(variables["params"]["conv1"]["kernel"])
        np.testing.assert_array_equal(kernels["0"], kernels["1"])
        # lecun_normal fan-in variance — same law as the nn.Conv default
        np.testing.assert_allclose(
            float(np.square(kernels["1"]).mean()), 1.0 / (7 * 7 * 3), rtol=0.2
        )
