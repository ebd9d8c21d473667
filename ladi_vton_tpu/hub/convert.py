"""torch-checkpoint -> flax-params converters.

The reference distributes weights as torch ``.pth`` state dicts through
torch.hub (reference: hubconf.py:16-64) and loads diffusers/transformers
pretrained towers (src/inference.py:123-129).  These converters map
those state dicts onto this framework's NHWC flax modules:

* conv (O,I,kh,kw) -> kernel (kh,kw,I,O); linear (O,I) -> (I,O)
* Group/LayerNorm weight/bias -> scale/bias; BatchNorm running stats ->
  flax ``batch_stats`` collection
* module-name maps documented per family below.

Everything operates on plain numpy dicts, so no torch tensor ever
reaches a TPU transfer path; ``load_torch_state`` gates the torch
import (torch is CPU-only in this environment and optional at runtime).

``widen_conv_in`` reproduces the 9->31 channel conv_in surgery
(reference src/train_vto.py:259-277): pretrained weights fill the first
9 input channels, new channels start at zero.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import numpy as np


def load_torch_state(path: str) -> dict[str, np.ndarray]:
    """Load a .pth/.bin state dict to numpy (host-side)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().float().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Builder:
    """Accumulates params/batch_stats trees from (path, kind, tensor)."""

    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}

    def conv(self, path, state, tname, bias=True):
        _set(self.params, path + ("kernel",), _conv_kernel(state[tname + ".weight"]))
        if bias and tname + ".bias" in state:
            _set(self.params, path + ("bias",), state[tname + ".bias"])

    def dense(self, path, state, tname, bias=True):
        _set(self.params, path + ("kernel",), state[tname + ".weight"].T)
        if bias and tname + ".bias" in state:
            _set(self.params, path + ("bias",), state[tname + ".bias"])

    def norm(self, path, state, tname):
        _set(self.params, path + ("scale",), state[tname + ".weight"])
        _set(self.params, path + ("bias",), state[tname + ".bias"])

    def batchnorm(self, path, state, tname):
        self.norm(path, state, tname)
        _set(self.batch_stats, path + ("mean",), state[tname + ".running_mean"])
        _set(self.batch_stats, path + ("var",), state[tname + ".running_var"])

    def embed(self, path, state, tname):
        _set(self.params, path + ("embedding",), state[tname + ".weight"])

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


# ---------------------------------------------------------------- resnet/attn


def _convert_resnet(b: _Builder, state, t: str, f: tuple[str, ...],
                    temb: bool):
    b.norm(f + ("norm1",), state, t + ".norm1")
    b.conv(f + ("conv1",), state, t + ".conv1")
    if temb and t + ".time_emb_proj.weight" in state:
        b.dense(f + ("time_emb_proj",), state, t + ".time_emb_proj")
    b.norm(f + ("norm2",), state, t + ".norm2")
    b.conv(f + ("conv2",), state, t + ".conv2")
    if t + ".conv_shortcut.weight" in state:
        b.conv(f + ("conv_shortcut",), state, t + ".conv_shortcut")


def _convert_vae_attn(b: _Builder, state, t: str, f: tuple[str, ...]):
    b.norm(f + ("group_norm",), state, t + ".group_norm")
    for name in ("query", "key", "value", "proj_attn"):
        b.dense(f + (name,), state, f"{t}.{name}")


def _convert_transformer2d(b: _Builder, state, t: str, f: tuple[str, ...],
                           linear_proj: bool):
    b.norm(f + ("norm",), state, t + ".norm")
    if linear_proj:
        b.dense(f + ("proj_in",), state, t + ".proj_in")
        b.dense(f + ("proj_out",), state, t + ".proj_out")
    else:
        b.conv(f + ("proj_in",), state, t + ".proj_in")
        b.conv(f + ("proj_out",), state, t + ".proj_out")
    i = 0
    while f"{t}.transformer_blocks.{i}.norm1.weight" in state:
        tb = f"{t}.transformer_blocks.{i}"
        fb = f + (f"transformer_blocks_{i}",)
        for n in ("norm1", "norm2", "norm3"):
            b.norm(fb + (n,), state, f"{tb}.{n}")
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                b.dense(fb + (attn, proj), state, f"{tb}.{attn}.{proj}",
                        bias=False)
            b.dense(fb + (attn, "to_out"), state, f"{tb}.{attn}.to_out.0")
        b.dense(fb + ("ff", "proj_geglu"), state, f"{tb}.ff.net.0.proj")
        b.dense(fb + ("ff", "proj_out"), state, f"{tb}.ff.net.2")
        i += 1


# --------------------------------------------------------------------- UNet


def convert_unet(state: Mapping[str, np.ndarray],
                 use_linear_projection: bool = True) -> dict:
    """diffusers UNet2DConditionModel state dict -> UNet2DCondition vars."""
    b = _Builder()
    b.conv(("conv_in",), state, "conv_in")
    b.dense(("time_embedding", "linear_1"), state, "time_embedding.linear_1")
    b.dense(("time_embedding", "linear_2"), state, "time_embedding.linear_2")

    def block(t_prefix: str, f_prefix: tuple[str, ...]):
        i = 0
        while f"{t_prefix}.resnets.{i}.norm1.weight" in state:
            _convert_resnet(b, state, f"{t_prefix}.resnets.{i}",
                            f_prefix + (f"resnets_{i}",), temb=True)
            i += 1
        i = 0
        while f"{t_prefix}.attentions.{i}.norm.weight" in state:
            _convert_transformer2d(b, state, f"{t_prefix}.attentions.{i}",
                                   f_prefix + (f"attentions_{i}",),
                                   use_linear_projection)
            i += 1
        if f"{t_prefix}.downsamplers.0.conv.weight" in state:
            b.conv(f_prefix + ("downsamplers_0", "conv"), state,
                   f"{t_prefix}.downsamplers.0.conv")
        if f"{t_prefix}.upsamplers.0.conv.weight" in state:
            b.conv(f_prefix + ("upsamplers_0", "conv"), state,
                   f"{t_prefix}.upsamplers.0.conv")

    i = 0
    while f"down_blocks.{i}.resnets.0.norm1.weight" in state:
        block(f"down_blocks.{i}", (f"down_blocks_{i}",))
        i += 1
    block("mid_block", ("mid_block",))
    i = 0
    while f"up_blocks.{i}.resnets.0.norm1.weight" in state:
        block(f"up_blocks.{i}", (f"up_blocks_{i}",))
        i += 1
    b.norm(("conv_norm_out",), state, "conv_norm_out")
    b.conv(("conv_out",), state, "conv_out")
    return b.variables()


def widen_conv_in(unet_vars: dict, new_in_channels: int) -> dict:
    """9 -> N channel conv_in surgery, zero-init for the new channels
    (reference src/train_vto.py:259-277, hubconf.py:30-37)."""
    kernel = unet_vars["params"]["conv_in"]["kernel"]
    kh, kw, old_in, out = kernel.shape
    if old_in == new_in_channels:
        return unet_vars
    new = np.zeros((kh, kw, new_in_channels, out), kernel.dtype)
    new[:, :, :old_in, :] = kernel
    unet_vars["params"]["conv_in"]["kernel"] = new
    return unet_vars


# ---------------------------------------------------------------------- VAE


def convert_vae(state: Mapping[str, np.ndarray]) -> dict:
    """diffusers AutoencoderKL state dict -> AutoencoderKL vars."""
    b = _Builder()

    def half(side: str):
        b.conv((side, "conv_in"), state, f"{side}.conv_in")
        blocks = "down_blocks" if side == "encoder" else "up_blocks"
        i = 0
        while f"{side}.{blocks}.{i}.resnets.0.norm1.weight" in state:
            t = f"{side}.{blocks}.{i}"
            f = (side, f"{blocks}_{i}")
            j = 0
            while f"{t}.resnets.{j}.norm1.weight" in state:
                _convert_resnet(b, state, f"{t}.resnets.{j}",
                                f + (f"resnets_{j}",), temb=False)
                j += 1
            if f"{t}.downsamplers.0.conv.weight" in state:
                b.conv(f + ("downsamplers_0", "conv"), state,
                       f"{t}.downsamplers.0.conv")
            if f"{t}.upsamplers.0.conv.weight" in state:
                b.conv(f + ("upsamplers_0", "conv"), state,
                       f"{t}.upsamplers.0.conv")
            i += 1
        _convert_resnet(b, state, f"{side}.mid_block.resnets.0",
                        (side, "mid_block", "resnets_0"), temb=False)
        _convert_vae_attn(b, state, f"{side}.mid_block.attentions.0",
                          (side, "mid_block", "attentions_0"))
        _convert_resnet(b, state, f"{side}.mid_block.resnets.1",
                        (side, "mid_block", "resnets_1"), temb=False)
        b.norm((side, "conv_norm_out"), state, f"{side}.conv_norm_out")
        b.conv((side, "conv_out"), state, f"{side}.conv_out")

    half("encoder")
    half("decoder")
    b.conv(("quant_conv",), state, "quant_conv")
    b.conv(("post_quant_conv",), state, "post_quant_conv")
    return b.variables()


# --------------------------------------------------------------------- CLIP


def _convert_clip_layer(b: _Builder, state, t: str, f: tuple[str, ...]):
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        b.dense(f + ("self_attn", proj), state, f"{t}.self_attn.{proj}")
    b.norm(f + ("layer_norm1",), state, f"{t}.layer_norm1")
    b.norm(f + ("layer_norm2",), state, f"{t}.layer_norm2")
    b.dense(f + ("mlp_fc1",), state, f"{t}.mlp.fc1")
    b.dense(f + ("mlp_fc2",), state, f"{t}.mlp.fc2")


def convert_clip_text(state: Mapping[str, np.ndarray]) -> dict:
    """transformers CLIPTextModel state dict -> CLIPTextModel vars."""
    b = _Builder()
    p = "text_model"
    b.embed(("token_embedding",), state, f"{p}.embeddings.token_embedding")
    b.embed(("position_embedding",), state,
            f"{p}.embeddings.position_embedding")
    i = 0
    while f"{p}.encoder.layers.{i}.layer_norm1.weight" in state:
        _convert_clip_layer(b, state, f"{p}.encoder.layers.{i}",
                            (f"layers_{i}",))
        i += 1
    b.norm(("final_layer_norm",), state, f"{p}.final_layer_norm")
    return b.variables()


def convert_clip_vision(state: Mapping[str, np.ndarray]) -> dict:
    """transformers CLIPVisionModel state dict -> CLIPVisionModel vars."""
    b = _Builder()
    p = "vision_model"
    _set(b.params, ("class_embedding",),
         state[f"{p}.embeddings.class_embedding"])
    b.conv(("patch_embedding",), state, f"{p}.embeddings.patch_embedding",
           bias=False)
    b.embed(("position_embedding",), state,
            f"{p}.embeddings.position_embedding")
    b.norm(("pre_layrnorm",), state, f"{p}.pre_layrnorm")
    i = 0
    while f"{p}.encoder.layers.{i}.layer_norm1.weight" in state:
        _convert_clip_layer(b, state, f"{p}.encoder.layers.{i}",
                            (f"layers_{i}",))
        i += 1
    return b.variables()


# -------------------------------------------------------- LaDI-VTON adapters


def convert_emasc(state: Mapping[str, np.ndarray],
                  kind: str = "nonlinear") -> dict:
    """EMASC .pth (reference emasc.py module names conv.N[.0/.2])."""
    b = _Builder()
    i = 0
    if kind == "linear":
        while f"conv.{i}.weight" in state:
            b.conv((f"conv_{i}_0",), state, f"conv.{i}")
            i += 1
    else:
        while f"conv.{i}.0.weight" in state:
            b.conv((f"conv_{i}_0",), state, f"conv.{i}.0")
            b.conv((f"conv_{i}_2",), state, f"conv.{i}.2")
            i += 1
    return b.variables()


def convert_inversion_adapter(state: Mapping[str, np.ndarray]) -> dict:
    """InversionAdapter .pth (reference inversion_adapter.py)."""
    b = _Builder()
    i = 0
    while f"encoder_layers.{i}.layer_norm1.weight" in state:
        _convert_clip_layer(b, state, f"encoder_layers.{i}",
                            (f"encoder_layers_{i}",))
        i += 1
    b.norm(("post_layernorm",), state, "post_layernorm")
    for j in (0, 3, 6):
        b.dense((f"layers_{j}",), state, f"layers.{j}")
    return b.variables()


def convert_tps(state: Mapping[str, np.ndarray]) -> dict:
    """ConvNet_TPS .pth -> ConvNetTPS vars.

    Torch Sequential index map (reference ConvNet_TPS.py:29-55,90-123):
    extraction model: convs at 0,3,6,9,12,15; BNs at 2,5,8,11,14;
    regression conv: convs at 0,3,6,9; BNs at 1,4,7,10.
    """
    b = _Builder()
    ext_convs = (0, 3, 6, 9, 12, 15)
    ext_bns = (2, 5, 8, 11, 14)
    for tower in ("extractionA", "extractionB"):
        for fi, ti in enumerate(ext_convs):
            b.conv((tower, f"conv_{fi}"), state, f"{tower}.model.{ti}")
        for fi, ti in enumerate(ext_bns):
            b.batchnorm((tower, f"bn_{fi}"), state, f"{tower}.model.{ti}")
    reg_t = "loc_net.regression"
    for fi, ti in enumerate((0, 3, 6, 9)):
        b.conv(("regression", f"conv_{fi}"), state, f"{reg_t}.conv.{ti}")
    for fi, ti in enumerate((1, 4, 7, 10)):
        b.batchnorm(("regression", f"bn_{fi}"), state, f"{reg_t}.conv.{ti}")
    b.dense(("regression", "linear"), state, f"{reg_t}.linear")
    return b.variables()


def convert_refinement(state: Mapping[str, np.ndarray]) -> dict:
    """UNetVanilla .pth -> refinement.UNetVanilla vars.

    double_conv Sequential: convs at 0,3 (bias=False); BNs at 1,4
    (reference unet_parts.py:15-22).
    """
    b = _Builder()

    def dc(t: str, f: tuple[str, ...]):
        b.conv(f + ("conv_0",), state, f"{t}.0", bias=False)
        b.batchnorm(f + ("bn_0",), state, f"{t}.1")
        b.conv(f + ("conv_1",), state, f"{t}.3", bias=False)
        b.batchnorm(f + ("bn_1",), state, f"{t}.4")

    dc("inc.double_conv", ("inc",))
    for i in (1, 2, 3, 4):
        dc(f"down{i}.maxpool_conv.1.double_conv", (f"down{i}",))
    for i in (1, 2, 3, 4):
        dc(f"up{i}.conv.double_conv", (f"up{i}",))
        if f"up{i}.up.weight" in state:  # ConvTranspose variant
            _set(b.params, (f"up{i}_convt", "kernel"),
                 np.transpose(state[f"up{i}.up.weight"], (2, 3, 1, 0)))
            _set(b.params, (f"up{i}_convt", "bias"), state[f"up{i}.up.bias"])
    b.conv(("outc",), state, "outc.conv")
    return b.variables()


def convert_vgg19(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg19 ``features`` state dict -> VGG19Features vars.

    Accepts either full-model keys (``features.N.weight``) or the
    reference's sliced module keys (``sliceK.N.weight``,
    vgg_loss.py:11-25) — both index by the same torchvision N.
    """
    b = _Builder()
    idx_pat = re.compile(r"(?:features|slice\d)\.(\d+)\.weight$")
    for key in list(state):
        m = idx_pat.search(key)
        if m:
            n = int(m.group(1))
            b.conv((f"conv_{n}",), state, key[: -len(".weight")])
    return b.variables()
