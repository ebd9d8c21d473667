"""EMASC-aware KL autoencoder (SD-2 VAE with feature taps/injection).

Re-design of the reference's forked diffusers AutoencoderKL
(reference: src/models/AutoencoderKL.py:145-188, src/models/vae.py:99-119
and :183-212): the encoder returns its per-block intermediate features
(input, post-conv_in, and the input of every down block — 6 tensors) and
the decoder *adds* externally supplied features (the EMASC adapter
outputs) before each up block, plus the ``int_layers`` 1/0 edge cases
around conv_out.

SD-2-inpainting config: 3->4 latent channels, block_out_channels
(128, 256, 512, 512), 2 layers/block, GN(32, eps=1e-6),
scaling_factor 0.18215.

Layout is NHWC.  The reference's tiled/sliced encode-decode memory
escape hatches (AutoencoderKL.py:200-290) are provided as
``tiled_encode`` / ``tiled_decode`` below (overlap-blend tiling with an
interior-match guarantee, tested in tests/test_models.py); at 512x384
they are unneeded — batch sharding over the mesh is the primary scaling
mechanism — but large-image offline use gets the same escape hatch the
reference has.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    VAEAttention,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, use_temb=False, eps=1e-6,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"resnets_{i}")(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, padding=0, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, use_temb=False, eps=1e-6,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(self.channels, use_temb=False, eps=1e-6,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="resnets_0")(x)
        x = VAEAttention(self.channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, use_temb=False, eps=1e-6,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    """VAE encoder that also returns intermediate features for EMASC.

    Feature list (reference: src/models/vae.py:99-110): [input,
    post-conv_in, input-of-down-block-0..3] — channels
    [3, 128, 128, 128, 256, 512] at strides [1, 1, 1, 1, 2, 4].
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        cfg = self.config
        feats = [x]
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)
        feats.append(h)
        n = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            feats.append(h)
            h = DownEncoderBlock(out_ch, cfg.layers_per_block,
                                 add_downsample=i < n - 1, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"down_blocks_{i}")(h)
        h = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mid_block")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, act="silu", dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv_norm_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_out")(h)
        return h, feats


class Decoder(nn.Module):
    """VAE decoder with additive EMASC feature injection.

    Injection arithmetic mirrors reference src/models/vae.py:183-212:
    features arrive ordered by encoder index and are consumed reversed —
    one added before each up block; an ``int_layers``-contains-1 feature
    added after conv_norm_out/act; a 0 feature added after conv_out.
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        intermediate_features: Optional[Sequence[jax.Array]] = None,
        int_layers: Optional[Sequence[int]] = None,
    ) -> jax.Array:
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[-1], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(z)
        h = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mid_block")(h)

        feats_rev = None
        if intermediate_features is not None:
            feats_rev = list(reversed(list(intermediate_features)))

        reversed_channels = list(reversed(cfg.block_out_channels))
        n = len(reversed_channels)
        for i, out_ch in enumerate(reversed_channels):
            if feats_rev is not None and i < len(feats_rev):
                h = h + feats_rev[i].astype(h.dtype)
            h = UpDecoderBlock(out_ch, cfg.layers_per_block + 1,
                               add_upsample=i < n - 1, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"up_blocks_{i}")(h)

        h = GroupNorm(cfg.norm_num_groups, 1e-6, act="silu", dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv_norm_out")(h)
        if feats_rev is not None and int_layers and 1 in int_layers:
            idx = len(int_layers) - 1 - list(int_layers).index(1)
            h = h + feats_rev[idx].astype(h.dtype)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_out")(h)
        if feats_rev is not None and int_layers and 0 in int_layers:
            idx = len(int_layers) - 1 - list(int_layers).index(0)
            h = h + feats_rev[idx].astype(h.dtype)
        return h


class AutoencoderKL(nn.Module):
    """KL VAE with quant/post-quant 1x1 convs and EMASC-aware decode."""

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype, self.param_dtype)
        self.decoder = Decoder(self.config, self.dtype, self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def encode(self, x: jax.Array):
        """Returns (moments(B,h,w,2*latent), intermediate_features)."""
        h, feats = self.encoder(x)
        return self.quant_conv(h), feats

    def decode(
        self,
        z: jax.Array,
        intermediate_features: Optional[Sequence[jax.Array]] = None,
        int_layers: Optional[Sequence[int]] = None,
    ) -> jax.Array:
        z = self.post_quant_conv(z)
        return self.decoder(z, intermediate_features, int_layers)

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None):
        moments, feats = self.encode(x)
        dist = DiagonalGaussian(moments)
        z = dist.sample(rng) if rng is not None else dist.mode()
        return self.decode(z), dist, feats

    def tiled_encode(self, x: jax.Array, *, tile: int = 512,
                     overlap: float = 0.25):
        """Memory-escape-hatch tiled encode (reference
        AutoencoderKL.py:200-243): overlapping spatial tiles encoded
        independently, latents blended at the seams.  Feature taps are
        not available in tiled mode (EMASC runs at standard sizes)."""
        blend = int(tile // 8 * overlap)
        stride = int(tile * (1 - overlap))
        B, H, W, _ = x.shape
        rows = []
        for i in range(0, H, stride):
            cols = []
            for j in range(0, W, stride):
                patch = x[:, i:i + tile, j:j + tile, :]
                moments, _ = self.encode(patch)
                cols.append(moments)
            rows.append(cols)
        return _blend_tiles(rows, blend)

    def tiled_decode(self, z: jax.Array, *, tile: int = 64,
                     overlap: float = 0.25):
        """Tiled decode (reference AutoencoderKL.py:245-290)."""
        blend = int(tile * 8 * overlap)
        stride = int(tile * (1 - overlap))
        B, H, W, _ = z.shape
        rows = []
        for i in range(0, H, stride):
            cols = []
            for j in range(0, W, stride):
                patch = z[:, i:i + tile, j:j + tile, :]
                cols.append(self.decode(patch))
            rows.append(cols)
        return _blend_tiles(rows, blend)


def _blend_tiles(rows, blend: int) -> jax.Array:
    """Linear seam blending of overlapping tiles
    (reference AutoencoderKL.py blend_v/blend_h)."""
    import numpy as np

    def ramp(n):
        return jnp.asarray(np.linspace(0.0, 1.0, n, endpoint=False),
                           jnp.float32)

    blended_rows = []
    for i, cols in enumerate(rows):
        row = None
        for j, tile_arr in enumerate(cols):
            t = tile_arr.astype(jnp.float32)
            if j > 0 and blend > 0:
                b = min(blend, t.shape[2], row.shape[2])
                w = ramp(b)[None, None, :, None]
                seam = row[:, :, -b:, :] * (1 - w) + t[:, :, :b, :] * w
                row = jnp.concatenate([row[:, :, :-b, :], seam,
                                       t[:, :, b:, :]], axis=2)
            else:
                row = t
        blended_rows.append(row)
    out = None
    for i, row in enumerate(blended_rows):
        if i > 0 and blend > 0:
            b = min(blend, row.shape[1], out.shape[1])
            w = ramp(b)[None, :, None, None]
            seam = out[:, -b:, :, :] * (1 - w) + row[:, :b, :, :] * w
            out = jnp.concatenate([out[:, :-b, :, :], seam,
                                   row[:, b:, :, :]], axis=1)
        else:
            out = row
    return out


class DiagonalGaussian:
    """Diagonal gaussian over NHWC moments (mean/logvar split on channels).

    Mirrors reference src/models/vae.py:329-373.
    """

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar,
            axis=(1, 2, 3),
        )
