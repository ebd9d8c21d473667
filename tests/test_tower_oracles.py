"""Whole-tiny-tower torch activation parity (VERDICT r2 item 2).

The reference's denoiser and VAE are diffusers modules verbatim
(reference: src/train_vto.py:259-277 builds UNet2DConditionModel;
src/models/vae.py is a fork of diffusers' AutoencoderKL).  The existing
export->convert round-trips cannot catch a self-consistent-but-wrong
layout convention (e.g. a transposed attention head split that is
inverted identically on both sides), and round 2 had exactly one
torch-side oracle (a single resnet block).  These tests drive tiny but
structurally complete towers — cross-attention, time embedding,
down/up-block skip plumbing, GEGLU FF, VAE attention mid-block, the
asymmetric VAE downsample pad — through plain-torch transcriptions of
the TRUE diffusers graphs (tests/torch_oracles.py) on the exported
diffusers-layout state dicts, and assert activations match <=1e-4.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_oracles import (  # noqa: E402
    torch_unet2d_condition,
    torch_vae_decode,
    torch_vae_encode,
)


def _export_state(variables, key_map=None):
    import tempfile

    from ladi_vton_tpu.core.checkpoint import export_torch_state

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        state = export_torch_state(variables, f.name, key_map=key_map)
    return {k: v.float() for k, v in state.items()}


def _nchw(x):
    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def test_unet_tiny_tower_matches_diffusers_torch_graph():
    """Full tiny UNet2DCondition forward == diffusers graph in torch."""
    from ladi_vton_tpu.core.checkpoint import unet_torch_key_map
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
    )

    cfg = UNetConfig(in_channels=9, out_channels=4,
                     block_out_channels=(32, 64, 64, 64), head_dim=8,
                     cross_attention_dim=16)
    unet = UNet2DCondition(cfg, attn_impl="xla")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 9)).astype(np.float32) * 0.3
    t = np.asarray([3, 977], np.int32)
    ctx = rng.standard_normal((2, 5, 16)).astype(np.float32) * 0.2
    variables = unet.init(jax.random.key(0), jnp.asarray(x),
                          jnp.asarray(t), jnp.asarray(ctx))

    ours = unet.apply(variables, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx))

    state = _export_state(variables, key_map=unet_torch_key_map)
    theirs = torch_unet2d_condition(
        state, _nchw(x), torch.from_numpy(np.asarray(t)),
        torch.from_numpy(ctx),
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        head_dim=cfg.head_dim,
        down_block_has_attn=cfg.down_block_has_attn)

    np.testing.assert_allclose(
        np.asarray(ours),
        theirs.permute(0, 2, 3, 1).numpy(), atol=1e-4, rtol=1e-3)


def test_vae_tiny_tower_matches_diffusers_torch_graph():
    """Tiny AutoencoderKL encode+decode == diffusers graph in torch,
    including the attention mid-block and the asymmetric (0,1,0,1)
    encoder downsample pad."""
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(block_out_channels=(32, 32, 64, 64))
    vae = AutoencoderKL(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5
    variables = vae.init(jax.random.key(0), jnp.asarray(x))
    state = _export_state(variables)

    moments, _ = vae.apply(variables, jnp.asarray(x), method="encode")
    moments_t = torch_vae_encode(
        state, _nchw(x), block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        groups=cfg.norm_num_groups)
    np.testing.assert_allclose(
        np.asarray(moments), moments_t.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-3)

    z = np.asarray(moments)[..., :cfg.latent_channels]
    decoded = vae.apply(variables, jnp.asarray(z), method="decode")
    decoded_t = torch_vae_decode(
        state, _nchw(z), block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        groups=cfg.norm_num_groups)
    np.testing.assert_allclose(
        np.asarray(decoded), decoded_t.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-3)
