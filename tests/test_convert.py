"""Weight conversion tests: torch-layout round trips + numeric parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from ladi_vton_tpu.core.checkpoint import export_torch_state
from ladi_vton_tpu.hub.convert import (
    _Builder,
    convert_emasc,
    convert_refinement,
    convert_tps,
    convert_vgg19,
)
from ladi_vton_tpu.models.emasc import EMASC


def test_resnet_block_numeric_parity_with_torch():
    """conv/GN layout conversion verified against a torch oracle."""

    class TorchResnet(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = nn.GroupNorm(4, cin, eps=1e-5)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = nn.GroupNorm(4, cout, eps=1e-5)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            return self.conv_shortcut(x) + h

    torch.manual_seed(0)
    tmodel = TorchResnet(8, 16).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    b = _Builder()
    b.norm(("norm1",), state, "norm1")
    b.conv(("conv1",), state, "conv1")
    b.norm(("norm2",), state, "norm2")
    b.conv(("conv2",), state, "conv2")
    b.conv(("conv_shortcut",), state, "conv_shortcut")
    variables = jax.tree_util.tree_map(jnp.asarray, b.variables())

    from ladi_vton_tpu.models.layers import ResnetBlock2D

    block = ResnetBlock2D(16, use_temb=False, groups=4)
    x = np.random.default_rng(0).standard_normal((2, 6, 5, 8)).astype(
        np.float32)
    ours = block.apply(variables, jnp.asarray(x))
    theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours),
        theirs.detach().permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)


def _fake_state_from_flax(variables, key_map=None):
    """Inverse-map flax params to a torch-style numpy state dict."""
    import io

    buf = io.BytesIO()

    class _Sink:
        def __init__(self):
            self.state = None

    # reuse export path through a temp file
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        state = export_torch_state(variables, f.name, key_map=key_map)
    return {k: v.numpy() for k, v in state.items()}


def test_emasc_convert_round_trip():
    emasc = EMASC(in_channels=(8, 16), out_channels=(8, 32),
                  kind="nonlinear")
    feats = [jnp.ones((1, 8, 8, 8)), jnp.ones((1, 4, 4, 16))]
    variables = emasc.init(jax.random.key(0), feats)
    state = _fake_state_from_flax(variables)
    # exported keys follow the reference module layout conv.N.{0,2}
    assert "conv.0.0.weight" in state and "conv.1.2.bias" in state
    back = convert_emasc(state, kind="nonlinear")
    out_a = emasc.apply(variables, feats)
    out_b = emasc.apply(
        jax.tree_util.tree_map(jnp.asarray, back), feats)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_vgg19_convert_from_torch_layout():
    rng = np.random.default_rng(0)
    state = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    tv_idx = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28)
    for (cin, cout), ti in zip(chans, tv_idx):
        state[f"features.{ti}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        state[f"features.{ti}.bias"] = np.zeros(cout, np.float32)
    variables = convert_vgg19(state)
    from ladi_vton_tpu.models.vgg import VGG19Features

    vgg = VGG19Features()
    x = jnp.zeros((1, 32, 32, 3))
    feats = vgg.apply(jax.tree_util.tree_map(jnp.asarray, variables), x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]


def test_widen_conv_in():
    from ladi_vton_tpu.hub.convert import widen_conv_in

    kernel = np.arange(3 * 3 * 9 * 4, dtype=np.float32).reshape(3, 3, 9, 4)
    variables = {"params": {"conv_in": {"kernel": kernel.copy(),
                                        "bias": np.zeros(4)}}}
    out = widen_conv_in(variables, 31)
    new = out["params"]["conv_in"]["kernel"]
    assert new.shape == (3, 3, 31, 4)
    np.testing.assert_array_equal(new[:, :, :9], kernel)
    np.testing.assert_array_equal(new[:, :, 9:], 0.0)


def test_tps_and_refinement_export_then_convert_round_trip():
    from ladi_vton_tpu.models.refinement import UNetVanilla
    from ladi_vton_tpu.models.tps import ConvNetTPS

    tps = ConvNetTPS(height=32, width=24)
    variables = tps.init(jax.random.key(0), jnp.zeros((1, 32, 24, 3)),
                         jnp.zeros((1, 32, 24, 21)))

    # export with reference Sequential-index names, then re-import
    from ladi_vton_tpu.core.checkpoint import tps_torch_key_map as tps_key_map

    state = _fake_state_from_flax(variables, key_map=tps_key_map)
    assert "extractionA.model.0.weight" in state
    assert "loc_net.regression.linear.bias" in state
    back = convert_tps(state)
    cloth = jnp.ones((1, 32, 24, 3)) * 0.1
    agn = jnp.zeros((1, 32, 24, 21))
    a = tps.apply(variables, cloth, agn)[0]
    b = tps.apply(jax.tree_util.tree_map(jnp.asarray, back), cloth, agn)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_export_then_convert_round_trip():
    """flax UNet -> diffusers-layout .pth -> convert_unet -> same output."""
    from ladi_vton_tpu.core.checkpoint import unet_torch_key_map
    from ladi_vton_tpu.hub.convert import convert_unet
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
    )

    unet = UNet2DCondition(
        UNetConfig(in_channels=9, block_out_channels=(32, 64, 64, 64),
                   head_dim=8, cross_attention_dim=16), attn_impl="xla")
    x = jnp.zeros((1, 16, 16, 9))
    t = jnp.asarray([3])
    ctx = jnp.ones((1, 5, 16)) * 0.1
    variables = unet.init(jax.random.key(0), x, t, ctx)

    state = _fake_state_from_flax(variables, key_map=unet_torch_key_map)
    # diffusers-layout keys present
    assert any(k.endswith("attn1.to_out.0.weight") for k in state)
    assert any(".ff.net.0.proj.weight" in k for k in state)
    back = convert_unet(state, use_linear_projection=True)

    a = unet.apply(variables, x, t, ctx)
    b = unet.apply(jax.tree_util.tree_map(jnp.asarray, back), x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vae_export_then_convert_round_trip():
    from ladi_vton_tpu.hub.convert import convert_vae
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64)))
    x = jnp.ones((1, 32, 32, 3)) * 0.2
    variables = vae.init(jax.random.key(0), x)
    state = _fake_state_from_flax(variables)
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in state
    back = convert_vae(state)
    a, _ = vae.apply(variables, x, method="encode")
    b, _ = vae.apply(jax.tree_util.tree_map(jnp.asarray, back), x,
                     method="encode")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cached_convert_roundtrip_and_hit(tmp_path, monkeypatch):
    """zoo._cached_convert: first call converts + writes an .npz; the
    second call loads the identical tree without invoking the
    converter.  Keyed on source mtime+size so retrained checkpoints
    reconvert."""
    import numpy as np

    from ladi_vton_tpu.hub import zoo

    monkeypatch.setenv("LADI_VTON_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "weights.pth"
    src.write_bytes(b"0" * 128)

    tree = {"params": {"conv": {"kernel": np.arange(12.0).reshape(3, 4),
                                "bias": np.zeros(4)},
                       "norm": {"scale": np.ones(4)}}}
    calls = []

    def convert():
        calls.append(1)
        return tree

    out1 = zoo._cached_convert(src, "testtag", convert)
    out2 = zoo._cached_convert(src, "testtag", convert)
    assert len(calls) == 1  # second call served from cache
    np.testing.assert_array_equal(out2["params"]["conv"]["kernel"],
                                  tree["params"]["conv"]["kernel"])
    np.testing.assert_array_equal(out2["params"]["norm"]["scale"],
                                  tree["params"]["norm"]["scale"])
    assert jax.tree_util.tree_structure(out1) == \
        jax.tree_util.tree_structure(out2)

    # touching the source invalidates the key
    src.write_bytes(b"0" * 256)
    zoo._cached_convert(src, "testtag", convert)
    assert len(calls) == 2


def test_vgg19_activations_match_torch_functional():
    """Independent torch transcription of the torchvision VGG19
    ``features`` stack (convs at the canonical indices, ReLU after
    each, MaxPool before blocks 2-5) vs our flax tower on converted
    weights — activation parity for every perceptual-loss tap
    (reference loss: src/utils/vgg_loss.py:7-68)."""
    import torch
    import torch.nn.functional as F

    from ladi_vton_tpu.models.vgg import VGG19Features

    rng = np.random.default_rng(17)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    tv_idx = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28)
    state = {}
    for (cin, cout), ti in zip(chans, tv_idx):
        state[f"features.{ti}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        state[f"features.{ti}.bias"] = rng.standard_normal(
            cout).astype(np.float32) * 0.01

    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)

    # torch-side oracle: pool precedes convs 5, 10, 19, 28
    taps, h = [], torch.from_numpy(x)
    pooled_before = {5, 10, 19, 28}
    tap_after = {0, 5, 10, 19, 28}
    with torch.no_grad():
        for (cin, cout), ti in zip(chans, tv_idx):
            if ti in pooled_before:
                h = F.max_pool2d(h, 2, 2)
            h = F.relu(F.conv2d(h, torch.from_numpy(state[f"features.{ti}.weight"]),
                                torch.from_numpy(state[f"features.{ti}.bias"]),
                                padding=1))
            if ti in tap_after:
                taps.append(h.numpy())

    vgg = VGG19Features()
    variables = jax.tree_util.tree_map(jnp.asarray, convert_vgg19(state))
    ours = vgg.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(ours) == len(taps) == 5
    for a, b in zip(ours, taps):
        # 13 chained fp32 convs accumulate ~1e-4 relative reorder noise
        # (XLA vs oneDNN summation order)
        np.testing.assert_allclose(np.asarray(a),
                                   np.transpose(b, (0, 2, 3, 1)),
                                   rtol=2e-3, atol=1e-3)
