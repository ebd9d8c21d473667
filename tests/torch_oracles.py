"""Plain-torch functional oracles for the metric networks.

In-image, independent re-implementations (torch.nn.functional only) of
the two metric towers the reference relies on through libraries that do
NOT exist in this image:

- the pytorch-fid InceptionV3 forward (the FID graph variant clean-fid
  evaluates: avg-pools with count_include_pad=False in the A/C/E1
  blocks, a max-pool in the E2 pool branch — reference metric source:
  /root/reference/src/utils/val_metrics.py:132-216 via clean-fid)
- the lpips-package AlexNet+lins forward (torchmetrics
  LearnedPerceptualImagePatchSimilarity(net='alex', normalize=True) —
  reference val_metrics.py:191)

Both load the SAME ``.pth`` files ``tools/make_metric_weights.py``
writes (and real released weights drop into), so
tests/test_torch_oracles.py can falsify the JAX towers' numerics
against torch in this image instead of skipping on missing libraries.

These are transcriptions of the publicly documented graphs, written
against torchvision's inception_v3 / alexnet layer tables — not ports
of this repo's flax modules (layer shapes, strides, paddings were
entered from the torch model definitions independently).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def _bc(state, name, x, stride=1, padding=0):
    """BasicConv2d: conv (no bias) + eval-mode BN(eps=1e-3) + ReLU."""
    w = state[f"{name}.conv.weight"]
    x = F.conv2d(x, w, stride=stride, padding=padding)
    g = state[f"{name}.bn.weight"][None, :, None, None]
    b = state[f"{name}.bn.bias"][None, :, None, None]
    m = state[f"{name}.bn.running_mean"][None, :, None, None]
    v = state[f"{name}.bn.running_var"][None, :, None, None]
    x = (x - m) / torch.sqrt(v + 1e-3) * g + b
    return F.relu(x)


def _avgpool_fid(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=False)


def _mixed_a(state, n, x):
    b1 = _bc(state, f"{n}.branch1x1", x)
    b5 = _bc(state, f"{n}.branch5x5_1", x)
    b5 = _bc(state, f"{n}.branch5x5_2", b5, padding=2)
    bd = _bc(state, f"{n}.branch3x3dbl_1", x)
    bd = _bc(state, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _bc(state, f"{n}.branch3x3dbl_3", bd, padding=1)
    bp = _bc(state, f"{n}.branch_pool", _avgpool_fid(x))
    return torch.cat([b1, b5, bd, bp], 1)


def _mixed_b(state, n, x):
    b3 = _bc(state, f"{n}.branch3x3", x, stride=2)
    bd = _bc(state, f"{n}.branch3x3dbl_1", x)
    bd = _bc(state, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _bc(state, f"{n}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _mixed_c(state, n, x):
    b1 = _bc(state, f"{n}.branch1x1", x)
    b7 = _bc(state, f"{n}.branch7x7_1", x)
    b7 = _bc(state, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = _bc(state, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = _bc(state, f"{n}.branch7x7dbl_1", x)
    bd = _bc(state, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _bc(state, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _bc(state, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _bc(state, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _bc(state, f"{n}.branch_pool", _avgpool_fid(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _mixed_d(state, n, x):
    b3 = _bc(state, f"{n}.branch3x3_1", x)
    b3 = _bc(state, f"{n}.branch3x3_2", b3, stride=2)
    b7 = _bc(state, f"{n}.branch7x7x3_1", x)
    b7 = _bc(state, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _bc(state, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _bc(state, f"{n}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _mixed_e(state, n, x, pool: str):
    b1 = _bc(state, f"{n}.branch1x1", x)
    b3 = _bc(state, f"{n}.branch3x3_1", x)
    b3 = torch.cat([
        _bc(state, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
        _bc(state, f"{n}.branch3x3_2b", b3, padding=(1, 0)),
    ], 1)
    bd = _bc(state, f"{n}.branch3x3dbl_1", x)
    bd = _bc(state, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat([
        _bc(state, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _bc(state, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], 1)
    if pool == "max":  # FIDInceptionE_2's pool branch
        p = F.max_pool2d(x, 3, stride=1, padding=1)
    else:  # FIDInceptionE_1: count_include_pad=False avg
        p = _avgpool_fid(x)
    bp = _bc(state, f"{n}.branch_pool", p)
    return torch.cat([b1, b3, bd, bp], 1)


@torch.no_grad()
def torch_inception_fid(state: dict, x: torch.Tensor):
    """pytorch-fid InceptionV3 forward.

    ``x``: (B, 3, 299, 299) float in [-1, 1] (TF-inception input
    normalization).  Returns (pool (B,2048), logits (B,num_classes)).
    """
    x = _bc(state, "Conv2d_1a_3x3", x, stride=2)
    x = _bc(state, "Conv2d_2a_3x3", x)
    x = _bc(state, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _bc(state, "Conv2d_3b_1x1", x)
    x = _bc(state, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    x = _mixed_a(state, "Mixed_5b", x)
    x = _mixed_a(state, "Mixed_5c", x)
    x = _mixed_a(state, "Mixed_5d", x)
    x = _mixed_b(state, "Mixed_6a", x)
    x = _mixed_c(state, "Mixed_6b", x)
    x = _mixed_c(state, "Mixed_6c", x)
    x = _mixed_c(state, "Mixed_6d", x)
    x = _mixed_c(state, "Mixed_6e", x)
    x = _mixed_d(state, "Mixed_7a", x)
    x = _mixed_e(state, "Mixed_7b", x, pool="avg")
    x = _mixed_e(state, "Mixed_7c", x, pool="max")
    pooled = F.adaptive_avg_pool2d(x, 1).flatten(1)
    logits = F.linear(pooled, state["fc.weight"], state["fc.bias"])
    return pooled, logits


_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


def _alex_feats(state, x):
    """torchvision AlexNet.features relu1..relu5 activations."""
    w = {i: (state[f"net.features.{i}.weight"],
             state[f"net.features.{i}.bias"]) for i in (0, 3, 6, 8, 10)}
    out = []
    x = F.relu(F.conv2d(x, *w[0], stride=4, padding=2))
    out.append(x)
    x = F.max_pool2d(x, 3, 2)
    x = F.relu(F.conv2d(x, *w[3], padding=2))
    out.append(x)
    x = F.max_pool2d(x, 3, 2)
    x = F.relu(F.conv2d(x, *w[6], padding=1))
    out.append(x)
    x = F.relu(F.conv2d(x, *w[8], padding=1))
    out.append(x)
    x = F.relu(F.conv2d(x, *w[10], padding=1))
    out.append(x)
    return out


@torch.no_grad()
def torch_lpips_alex(state: dict, img0: torch.Tensor,
                     img1: torch.Tensor, *,
                     normalize: bool = True) -> float:
    """lpips-package LPIPS(net='alex') forward, batch-mean scalar.

    ``img0/img1``: (B, 3, H, W) float; in [0, 1] when ``normalize``
    (the torchmetrics normalize=True convention), else in [-1, 1].
    """
    if normalize:
        img0 = img0 * 2.0 - 1.0
        img1 = img1 * 2.0 - 1.0
    shift = torch.tensor(_LPIPS_SHIFT)[None, :, None, None]
    scale = torch.tensor(_LPIPS_SCALE)[None, :, None, None]
    f0 = _alex_feats(state, (img0 - shift) / scale)
    f1 = _alex_feats(state, (img1 - shift) / scale)
    total = torch.zeros(img0.shape[0])
    for k, (a, b) in enumerate(zip(f0, f1)):
        # lpips normalize_tensor: x / (sqrt(sum x^2 over C) + 1e-10)
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        head = F.conv2d(d, state[f"lins.{k}.model.1.weight"])
        total = total + head.mean(dim=(1, 2, 3))
    return float(total.mean())


# --------------------------------------------------------------------
# Tiny-tower diffusers-semantics oracles (VERDICT r2 item 2).
#
# Transcriptions of diffusers' UNet2DConditionModel / AutoencoderKL
# forward passes (the modules the reference uses verbatim —
# /root/reference/src/train_vto.py:259-277 and src/models/vae.py), in
# plain torch.nn.functional over a diffusers-layout state dict.  These
# drive converted weights through the TRUE torch graph so a
# self-consistent-but-wrong layout convention in the flax port cannot
# survive (SURVEY §7.3 names NCHW->NHWC conversion fidelity the #1
# hard part).


def _gn(state, name, x, groups, eps):
    return F.group_norm(x, groups, state[f"{name}.weight"],
                        state[f"{name}.bias"], eps)


def _conv(state, name, x, stride=1, padding=1):
    return F.conv2d(x, state[f"{name}.weight"], state[f"{name}.bias"],
                    stride=stride, padding=padding)


def _linear(state, name, x, bias=True):
    return F.linear(x, state[f"{name}.weight"],
                    state[f"{name}.bias"] if bias else None)


def _resnet(state, n, x, temb=None, groups=32, eps=1e-5):
    h = F.silu(_gn(state, f"{n}.norm1", x, groups, eps))
    h = _conv(state, f"{n}.conv1", h)
    if temb is not None and f"{n}.time_emb_proj.weight" in state:
        h = h + _linear(state, f"{n}.time_emb_proj",
                        F.silu(temb))[:, :, None, None]
    h = F.silu(_gn(state, f"{n}.norm2", h, groups, eps))
    h = _conv(state, f"{n}.conv2", h)
    if f"{n}.conv_shortcut.weight" in state:
        x = _conv(state, f"{n}.conv_shortcut", x, padding=0)
    return x + h


def _mha(state, n, x, context, heads):
    """diffusers CrossAttention: per-head softmax attention,
    scale = head_dim**-0.5, to_q/k/v bias-free, to_out.0 with bias."""
    q = F.linear(x, state[f"{n}.to_q.weight"])
    k = F.linear(context, state[f"{n}.to_k.weight"])
    v = F.linear(context, state[f"{n}.to_v.weight"])
    B, Sq, inner = q.shape
    d = inner // heads

    def split(t):
        return t.view(B, -1, heads, d).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(B, Sq, inner)
    return _linear(state, f"{n}.to_out.0", out)


def _transformer2d(state, n, x, context, heads):
    """Transformer2DModel with use_linear_projection=True (SD-2)."""
    B, C, H, W = x.shape
    residual = x
    h = _gn(state, f"{n}.norm", x, 32, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = _linear(state, f"{n}.proj_in", h)
    tb = f"{n}.transformer_blocks.0"
    ln = lambda m, t: F.layer_norm(
        t, (t.shape[-1],), state[f"{m}.weight"], state[f"{m}.bias"], 1e-5)
    h = h + _mha(state, f"{tb}.attn1", ln(f"{tb}.norm1", h), ln(f"{tb}.norm1", h), heads)
    h = h + _mha(state, f"{tb}.attn2", ln(f"{tb}.norm2", h), context, heads)
    ff_in = ln(f"{tb}.norm3", h)
    proj = _linear(state, f"{tb}.ff.net.0.proj", ff_in)
    a, gate = proj.chunk(2, dim=-1)
    h = h + _linear(state, f"{tb}.ff.net.2", a * F.gelu(gate))
    h = _linear(state, f"{n}.proj_out", h)
    return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + residual


@torch.no_grad()
def torch_unet2d_condition(state, x, timesteps, context, *,
                           block_out_channels, layers_per_block,
                           head_dim, down_block_has_attn):
    """diffusers UNet2DConditionModel forward (SD-2 family graph).

    ``x``: (B, C_in, H, W); ``timesteps``: (B,); ``context``:
    (B, S, cross_dim).  Returns (B, C_out, H, W).
    """
    n_blocks = len(block_out_channels)

    # get_timestep_embedding(flip_sin_to_cos=True, freq_shift=0)
    dim = block_out_channels[0]
    half = dim // 2
    exponent = -torch.log(torch.tensor(10000.0)) * torch.arange(half) / half
    args = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    t_feat = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = _linear(state, "time_embedding.linear_1", t_feat)
    temb = _linear(state, "time_embedding.linear_2", F.silu(temb))

    h = _conv(state, "conv_in", x)
    skips = [h]
    for i in range(n_blocks):
        heads = block_out_channels[i] // head_dim
        for j in range(layers_per_block):
            h = _resnet(state, f"down_blocks.{i}.resnets.{j}", h, temb)
            if down_block_has_attn[i]:
                h = _transformer2d(
                    state, f"down_blocks.{i}.attentions.{j}", h,
                    context, heads)
            skips.append(h)
        if i < n_blocks - 1:
            h = _conv(state, f"down_blocks.{i}.downsamplers.0.conv", h,
                      stride=2)
            skips.append(h)

    heads = block_out_channels[-1] // head_dim
    h = _resnet(state, "mid_block.resnets.0", h, temb)
    h = _transformer2d(state, "mid_block.attentions.0", h, context, heads)
    h = _resnet(state, "mid_block.resnets.1", h, temb)

    up_has_attn = list(reversed(down_block_has_attn))
    for i, ch in enumerate(reversed(block_out_channels)):
        heads = ch // head_dim
        for j in range(layers_per_block + 1):
            skip = skips.pop()
            h = torch.cat([h, skip], dim=1)
            h = _resnet(state, f"up_blocks.{i}.resnets.{j}", h, temb)
            if up_has_attn[i]:
                h = _transformer2d(
                    state, f"up_blocks.{i}.attentions.{j}", h, context,
                    heads)
        if i < n_blocks - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(state, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(_gn(state, "conv_norm_out", h, 32, 1e-5))
    return _conv(state, "conv_out", h)


def _vae_attn(state, n, x, groups=32):
    """diffusers AttentionBlock (single head, scale 1/sqrt(C))."""
    B, C, H, W = x.shape
    residual = x
    h = _gn(state, f"{n}.group_norm", x, groups, 1e-6)
    h = h.view(B, C, H * W).transpose(1, 2)
    q = _linear(state, f"{n}.query", h)
    k = _linear(state, f"{n}.key", h)
    v = _linear(state, f"{n}.value", h)
    attn = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
    h = _linear(state, f"{n}.proj_attn", attn @ v)
    return h.transpose(1, 2).view(B, C, H, W) + residual


@torch.no_grad()
def torch_vae_encode(state, x, *, block_out_channels, layers_per_block,
                     groups=32):
    """diffusers AutoencoderKL.encode -> moments (B, 2*latent, h, w)."""
    n = len(block_out_channels)
    h = _conv(state, "encoder.conv_in", x)
    for i in range(n):
        for j in range(layers_per_block):
            h = _resnet(state, f"encoder.down_blocks.{i}.resnets.{j}", h,
                        groups=groups, eps=1e-6)
        if i < n - 1:
            # VAE downsample uses the asymmetric (0,1,0,1) pad
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(state,
                      f"encoder.down_blocks.{i}.downsamplers.0.conv", h,
                      stride=2, padding=0)
    h = _resnet(state, "encoder.mid_block.resnets.0", h, groups=groups,
                eps=1e-6)
    h = _vae_attn(state, "encoder.mid_block.attentions.0", h, groups)
    h = _resnet(state, "encoder.mid_block.resnets.1", h, groups=groups,
                eps=1e-6)
    h = F.silu(_gn(state, "encoder.conv_norm_out", h, groups, 1e-6))
    h = _conv(state, "encoder.conv_out", h)
    return _conv(state, "quant_conv", h, padding=0)


@torch.no_grad()
def torch_vae_decode(state, z, *, block_out_channels, layers_per_block,
                     groups=32):
    """diffusers AutoencoderKL.decode (no EMASC injection)."""
    n = len(block_out_channels)
    h = _conv(state, "post_quant_conv", z, padding=0)
    h = _conv(state, "decoder.conv_in", h)
    h = _resnet(state, "decoder.mid_block.resnets.0", h, groups=groups,
                eps=1e-6)
    h = _vae_attn(state, "decoder.mid_block.attentions.0", h, groups)
    h = _resnet(state, "decoder.mid_block.resnets.1", h, groups=groups,
                eps=1e-6)
    for i in range(n):
        for j in range(layers_per_block + 1):
            h = _resnet(state, f"decoder.up_blocks.{i}.resnets.{j}", h,
                        groups=groups, eps=1e-6)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(state, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      h)
    h = F.silu(_gn(state, "decoder.conv_norm_out", h, groups, 1e-6))
    return _conv(state, "decoder.conv_out", h)
