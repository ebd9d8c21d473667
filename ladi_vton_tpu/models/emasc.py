"""EMASC — Enhanced Mask-Aware Skip Connection adapters.

Per-scale adapters mapping VAE-encoder features of the *masked* person
image into decoder injection features (reference: src/models/emasc.py).
``linear`` = one 3x3 conv, zero-initialized (reference emasc.py:42-45);
``nonlinear`` = conv-SiLU-conv.  Channel plan in->out:
[128,128,128,256,512] -> [128,256,512,512,512]
(reference: hubconf.py:41-42, src/train_emasc.py:215-216).

The companion ``mask_features`` reproduces src/utils/data_utils.py:4-16:
each feature is multiplied by (1 - mask) at its own resolution so skips
only carry preserved (non-inpainted) content.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.ops.resize import resize_bilinear


def emasc_channels(vae_config) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(in_channels, out_channels) plan for a given VAE architecture.

    The five encoder taps are conv_in's output plus each down block's
    INPUT channel count (b0, b0, b0, b1, b2 for blocks b0..b3); the
    decoder injection points take (b0, b1, b2, b3, b3).  For the SD-2
    default VAE this reproduces the reference's hard-coded plan
    (reference hubconf.py:41-42, src/train_emasc.py:215-216); trainer
    CLIs derive it so tiny/custom VAEs drive the same path.
    """
    b = tuple(vae_config.block_out_channels)
    return (b[0], b[0], b[0], b[1], b[2]), (b[0], b[1], b[2], b[3], b[3])


class EMASC(nn.Module):
    in_channels: Sequence[int] = (128, 128, 128, 256, 512)
    out_channels: Sequence[int] = (128, 256, 512, 512, 512)
    kernel_size: int = 3
    kind: str = "nonlinear"  # 'linear' | 'nonlinear'
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> list[jax.Array]:
        if len(features) != len(self.in_channels):
            raise ValueError(
                f"expected {len(self.in_channels)} features, got {len(features)}"
            )
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        out = []
        for i, (feat, in_ch, out_ch) in enumerate(
            zip(features, self.in_channels, self.out_channels)
        ):
            h = feat.astype(self.dtype)
            if self.kind == "linear":
                h = nn.Conv(out_ch, (k, k), padding=pad,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"conv_{i}_0")(h)
            elif self.kind == "nonlinear":
                h = nn.Conv(in_ch, (k, k), padding=pad, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"conv_{i}_0")(h)
                h = nn.silu(h)
                h = nn.Conv(out_ch, (k, k), padding=pad, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"conv_{i}_2")(h)
            else:
                raise NotImplementedError(f"EMASC kind {self.kind!r}")
            out.append(h)
        return out


def mask_features(
    features: Sequence[jax.Array], mask: jax.Array
) -> list[jax.Array]:
    """Multiply each NHWC feature by (1 - mask) resized to its resolution.

    ``mask`` is (B, H, W, 1) with 1 = region to inpaint.
    """
    out = []
    for feat in features:
        m = resize_bilinear(mask.astype(feat.dtype), feat.shape[1:3])
        out.append(feat * (1.0 - m))
    return out
