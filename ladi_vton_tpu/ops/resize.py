"""Image resizing with torch-compatible semantics.

The reference resizes constantly: pose maps down 8x before UNet concat
(reference: src/vto_pipelines/tryon_pipe.py:632-634), cloth/masks to
256x192 before TPS (src/inference.py:242-250), masks to each EMASC
feature resolution (src/utils/data_utils.py:4-16).  torch
``F.interpolate(mode='bilinear', antialias=False)`` interpolates at
mapped sample points with no prefilter even when downsampling —
``jax.image.resize`` antialiases, so this is an explicit separable
gather-interpolation instead: per output row/column a pair of source
indices + a weight, applied as two takes and a lerp per axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_indices(in_size: int, out_size: int, align_corners: bool):
    """Static (lo, hi, weight) per output position for one axis."""
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = out * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = (out + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    w = (src - lo).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool = False
) -> jax.Array:
    """Resize NHWC (or HWC) to ``out_hw``. Matches torch bilinear
    (antialias=False) for both up- and down-sampling."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    B, H, W, C = x.shape
    OH, OW = out_hw
    if (H, W) == (OH, OW):
        return x[0] if squeeze else x

    dtype = x.dtype
    acc = x.astype(jnp.float32)
    if H != OH:
        lo, hi, w = _axis_indices(H, OH, align_corners)
        w = w[None, :, None, None]
        acc = acc[:, lo] * (1.0 - w) + acc[:, hi] * w
    if W != OW:
        lo, hi, w = _axis_indices(W, OW, align_corners)
        w = w[None, None, :, None]
        acc = acc[:, :, lo] * (1.0 - w) + acc[:, :, hi] * w
    out = acc.astype(dtype)
    return out[0] if squeeze else out


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize matching torch ``mode='nearest'``
    (floor of source index, no half-pixel shift)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    B, H, W, C = x.shape
    OH, OW = out_hw
    if (H, W) != (OH, OW):
        iy = jnp.asarray(
            np.minimum(np.floor(np.arange(OH) * (H / OH)), H - 1).astype(np.int32)
        )
        ix = jnp.asarray(
            np.minimum(np.floor(np.arange(OW) * (W / OW)), W - 1).astype(np.int32)
        )
        x = x[:, iy][:, :, ix]
    return x[0] if squeeze else x
