"""Shared NHWC Flax building blocks for the diffusion towers.

These are original TPU-first implementations of the block vocabulary the
reference consumes from diffusers (ResnetBlock2D, Transformer2D blocks,
up/down-sampling, timestep embeddings — reference: src/models/vae.py:22-23
imports, diffusers UNet2DConditionModel used at src/train_vto.py:252-257).
Everything is NHWC (channels-last — the TPU conv layout), computes in the
policy dtype, and keeps parameter naming aligned with the corresponding
torch modules so checkpoint conversion is a pure name/layout map.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.ops.attention import dot_product_attention


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep features, matching diffusers' convention."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 MLP over sinusoidal features."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.embed_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.embed_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear_2")(sample)
        return sample


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, stats in fp32.

    ``act="silu"`` fuses the activation that always follows the norm on
    the resnet path — on TPU the pair runs as one Pallas kernel
    (``ops.group_norm``), guaranteeing two HBM passes instead of
    whatever XLA decides; the XLA oracle is the CPU/test path.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: str = "none"
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        from ladi_vton_tpu.ops.group_norm import group_norm

        return group_norm(x, scale, bias, num_groups=self.num_groups,
                          eps=self.epsilon, act=self.act, impl=self.impl)


class Conv2d(nn.Module):
    """3x3/1x1/kxk conv in NHWC; thin wrapper for naming & dtype policy."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class ResnetBlock2D(nn.Module):
    """norm-silu-conv x2 with optional time embedding and 1x1 shortcut."""

    out_channels: int
    use_temb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, act="silu", dtype=self.dtype,
                      param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(h)
        if self.use_temb and temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="time_emb_proj")(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, act="silu", dtype=self.dtype,
                      param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 conv downsample. ``padding=0`` applies the asymmetric
    (0,1,0,1) pad the VAE encoder uses; ``padding=1`` is the UNet form."""

    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = ((0, 0), (0, 0))
        else:
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class _ConvParams(nn.Module):
    """Parameter-only holder matching nn.Conv/nn.Dense tree layout
    (kernel + bias, lecun-normal/zeros init), so fused implementations
    keep checkpoint compatibility with the plain-module layout."""

    kernel_shape: tuple
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.kernel_shape, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.kernel_shape[-1],), self.param_dtype)
        return kernel, bias


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv, computed as four 2x2 phase convs
    at low resolution (exact same math, 2.25x fewer FLOPs, no 4x
    intermediate tensor — ``ops.upsample``)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ladi_vton_tpu.ops.upsample import nearest_up2_conv3x3

        B, H, W, C = x.shape
        kernel, bias = _ConvParams((3, 3, C, self.out_channels),
                                   self.param_dtype, name="conv")()
        # measured (tools/perf.py upsample-phase (docs/PERF.md §4)): the phase decomposition wins
        # 20-35% at C>=512 sites but loses at wide-spatial low-C ones
        # (256ch@256x192: interleave cost beats the FLOP saving)
        if C >= 512:
            return nearest_up2_conv3x3(x.astype(self.dtype),
                                       kernel.astype(self.dtype),
                                       bias.astype(self.dtype))
        up = jnp.repeat(jnp.repeat(x.astype(self.dtype), 2, axis=1),
                        2, axis=2)
        dn = jax.lax.conv_dimension_numbers(
            up.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            up, kernel.astype(self.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
        ) + bias.astype(self.dtype)


class VAEAttention(nn.Module):
    """Single-head self-attention block used in the VAE mid block."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = GroupNorm(self.groups, self.eps, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="query")(h)
        k = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="key")(h)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="value")(h)
        # single head, D=C (512): the flash kernel still wins on TPU
        # (3.45 vs 4.87 ms at S=3072 — tools/perf.py vae-decode; docs/PERF.md §1); 'auto'
        # picks it per lowering platform
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            impl="auto"
        )[:, :, 0, :]
        out = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_attn")(out)
        return x + out.reshape(B, H, W, C)


class _DenseParams(nn.Module):
    """Parameter-only holder matching nn.Dense's tree layout."""

    shape: tuple
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],), self.param_dtype)
                if self.use_bias else None)
        return kernel, bias


# self-attn sequence lengths above this take the PLAIN projection path
# even under attn_impl="bhsd" (None = bhsd at every length).  Probe knob
# for per-resolution A/Bs: at S=3072 the bhsd projection einsum's output
# layout forces a relayout copy before the flash kernel (PERF.md §12).
BHSD_SEQ_CAP: Optional[int] = None


class CrossAttention(nn.Module):
    """Multi-head attention; self when ``context`` is None.

    ``attn_impl="bhsd"``: head-major layout — the head split/merge
    transposes are folded INTO the q/k/v and output projections as
    einsums (``bsc,chd->bhsd``), so the flash kernel's (B*H, S, D)
    operands come straight out of the matmuls with no relayout copy in
    between (the device trace showed 6.8 ms/step of layout copies —
    docs/PERF.md §6).  Parameter tree is identical to the plain path.
    """

    num_heads: int
    head_dim: int
    out_dim: int
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None,
                 kv: Optional[tuple] = None) -> jax.Array:
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        H, D = self.num_heads, self.head_dim
        if kv is not None:
            # Pre-projected context K/V (hoisted out of the denoise
            # scan — models/unet_condition.py precompute_context_kv).
            # to_k/to_v are still declared so init() yields the full
            # parameter tree either way.
            _DenseParams((context.shape[-1], inner), use_bias=False,
                         param_dtype=self.param_dtype, name="to_k")()
            _DenseParams((context.shape[-1], inner), use_bias=False,
                         param_dtype=self.param_dtype, name="to_v")()
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="to_q")(x)
            k, v = (a.astype(self.dtype) for a in kv)
            B, Sq, _ = q.shape
            Sk = k.shape[1]
            impl = "auto" if self.attn_impl == "bhsd" else self.attn_impl
            q = q.reshape(B, Sq, H, D)
            k = k.reshape(B, Sk, H, D)
            v = v.reshape(B, Sk, H, D)
            out = dot_product_attention(q, k, v, impl=impl)
            out = out.reshape(B, Sq, inner)
            return nn.Dense(self.out_dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="to_out")(out)
        if (self.attn_impl == "bhsd" and context.shape[1] > 128
                and (BHSD_SEQ_CAP is None
                     or context.shape[1] <= BHSD_SEQ_CAP)):
            cd = lambda a: a.astype(self.dtype)
            wq, _ = _DenseParams((x.shape[-1], inner), use_bias=False,
                                 param_dtype=self.param_dtype,
                                 name="to_q")()
            wk, _ = _DenseParams((context.shape[-1], inner),
                                 use_bias=False,
                                 param_dtype=self.param_dtype,
                                 name="to_k")()
            wv, _ = _DenseParams((context.shape[-1], inner),
                                 use_bias=False,
                                 param_dtype=self.param_dtype,
                                 name="to_v")()
            wo, bo = _DenseParams((inner, self.out_dim),
                                  param_dtype=self.param_dtype,
                                  name="to_out")()
            q = jnp.einsum("bsc,chd->bhsd", cd(x),
                           cd(wq).reshape(-1, H, D))
            k = jnp.einsum("bsc,chd->bhsd", cd(context),
                           cd(wk).reshape(-1, H, D))
            v = jnp.einsum("bsc,chd->bhsd", cd(context),
                           cd(wv).reshape(-1, H, D))
            out = dot_product_attention(q, k, v, impl="auto", bhsd=True)
            return (jnp.einsum("bhsd,hdc->bsc", out,
                               cd(wo).reshape(H, D, self.out_dim))
                    + cd(bo))
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(context)
        B, Sq, _ = q.shape
        Sk = k.shape[1]
        impl = "auto" if self.attn_impl == "bhsd" else self.attn_impl
        q = q.reshape(B, Sq, self.num_heads, self.head_dim)
        k = k.reshape(B, Sk, self.num_heads, self.head_dim)
        v = v.reshape(B, Sk, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v, impl=impl)
        out = out.reshape(B, Sq, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward: dim -> 2*4*dim (gated gelu) -> dim."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ladi_vton_tpu.ops.geglu import geglu

        inner = self.dim * self.mult
        C = x.shape[-1]
        w1, b1 = _ConvParams((C, inner * 2), self.param_dtype,
                             name="proj_geglu")()
        w2, b2 = _ConvParams((inner, self.dim), self.param_dtype,
                             name="proj_out")()
        # fused pallas FF on TPU (the 8C expansion never leaves VMEM);
        # XLA oracle elsewhere — ops/geglu.py
        return geglu(x.astype(self.dtype), w1, b1, w2, b2)


class FusedLayerNorm(nn.Module):
    """LayerNorm with the ``ops.layer_norm`` fused-kernel dispatch.

    Parameter names/shapes match ``nn.LayerNorm`` (``scale``/``bias``
    of shape (C,)) so checkpoint conversion is unchanged.
    """

    epsilon: float = 1e-5
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ladi_vton_tpu.ops.layer_norm import layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        return layer_norm(x.astype(self.dtype), scale, bias,
                          eps=self.epsilon, impl=self.impl)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual."""

    dim: int
    num_heads: int
    head_dim: int
    attn_impl: str = "auto"
    ln_impl: str = "xla"  # measured: pallas LN loses the full-UNet A/B (PERF.md §11a)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 context_kv: Optional[tuple] = None) -> jax.Array:
        ln = lambda name: FusedLayerNorm(epsilon=1e-5, impl=self.ln_impl,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dim,
                               attn_impl=self.attn_impl, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dim,
                               attn_impl=self.attn_impl, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="attn2")(ln("norm2")(x), context,
                                             kv=context_kv)
        x = x + FeedForwardGEGLU(self.dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> (linear|1x1) in -> blocks -> out + skip.

    SD-2 uses ``use_linear_projection=True`` so proj_in/out are Dense.
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    use_linear_projection: bool = True
    attn_impl: str = "auto"
    proj_out_impl: str = "dense"  # 'dense' | 'conv' (same params/math)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 kv_iter=None) -> jax.Array:
        B, H, W, C = x.shape
        inner = self.num_heads * self.head_dim
        residual = x
        h = GroupNorm(32, 1e-6, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.num_heads, self.head_dim, attn_impl=self.attn_impl,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}")(
                h, context,
                context_kv=None if kv_iter is None else next(kv_iter))
        if self.use_linear_projection:
            if self.proj_out_impl == "conv":
                # Same math/params as the Dense, emitted as a 1x1 conv
                # on the spatial NHWC tensor.  Measured full-UNet A/B:
                # LOSES to the Dense (82.42 vs 81.24 ms/step) — the
                # Dense's apparently slow dot (0.78 ms, ~6% MFU at
                # level 0) is really the NHWC<->S-lane boundary
                # relayout fused into it; the conv form just pays the
                # same copy on its input instead (docs/PERF.md §11).
                # Kept for the A/B probe; 'dense' is the default.
                wo, bo = _DenseParams((inner, C),
                                      param_dtype=self.param_dtype,
                                      name="proj_out")()
                h = h.reshape(B, H, W, inner)
                dn = jax.lax.conv_dimension_numbers(
                    h.shape, (1, 1, inner, C), ("NHWC", "HWIO", "NHWC"))
                h = jax.lax.conv_general_dilated(
                    h, wo.astype(self.dtype).reshape(1, 1, inner, C),
                    (1, 1), "VALID", dimension_numbers=dn,
                ) + bo.astype(self.dtype)
            else:
                h = nn.Dense(C, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="proj_out")(h)
                h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, inner)
            h = nn.Conv(C, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj_out")(h)
        return h + residual
