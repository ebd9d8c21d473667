"""Refinement UNet for the warped garment (stage-1, phase B).

Classic 4-down/4-up UNet refining the grid-sampled warped cloth
(reference: src/models/UNet.py, src/models/unet_parts.py; constructed
with in=24ch [masked person 3 + pose 18 + warped cloth 3], out=3ch,
bilinear upsampling — src/train_tps.py:383-391).  NHWC; BatchNorm uses
flax batch_stats (pass ``train=True`` during training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.ops.resize import resize_bilinear


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class UNetVanilla(nn.Module):
    """4-level UNet; ``bilinear=True`` matches the reference trainer."""

    out_channels: int = 3
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        dc = lambda out, mid, name: DoubleConv(
            out, mid, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)
        factor = 2 if self.bilinear else 1

        x1 = dc(64, None, "inc")(x.astype(self.dtype), train=train)
        down = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        x2 = dc(128, None, "down1")(down(x1), train=train)
        x3 = dc(256, None, "down2")(down(x2), train=train)
        x4 = dc(512, None, "down3")(down(x3), train=train)
        x5 = dc(1024 // factor, None, "down4")(down(x4), train=train)

        def up(h, skip, out_ch, name):
            if self.bilinear:
                h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2),
                                    align_corners=True)
                # reference Up: DoubleConv(in_channels, out,
                # mid=in_channels // 2) where in_channels counts the
                # CONCATENATED skip+upsampled tensor
                # (unet_parts.py:42-51) — pinned by the
                # reference-module activation-parity test
                mid = (skip.shape[-1] + h.shape[-1]) // 2
            else:
                h = nn.ConvTranspose(h.shape[-1] // 2, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"{name}_convt")(h)
                mid = None
            # pad to the skip's spatial size for odd resolutions
            # (reference unet_parts.py:59-63)
            dh = skip.shape[1] - h.shape[1]
            dw = skip.shape[2] - h.shape[2]
            if dh or dw:
                h = jnp.pad(h, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            h = jnp.concatenate([skip, h], axis=-1)
            return dc(out_ch, mid, name)(h, train=train)

        h = up(x5, x4, 512 // factor, "up1")
        h = up(h, x3, 256 // factor, "up2")
        h = up(h, x2, 128 // factor, "up3")
        h = up(h, x1, 64, "up4")
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="outc")(h)
