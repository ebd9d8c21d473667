"""Morphological ops for mask preprocessing.

The reference dilates the agnostic mask with ``cv2.dilate(kernel=5x5,
iterations=5)`` on the host (reference: src/dataset/dresscode.py:350).
Here dilation is a max-pool ``reduce_window`` so the whole mask pipeline
can run jit-compiled on device instead of stalling the input pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dilate(mask: jax.Array, kernel_size: int = 5, iterations: int = 1) -> jax.Array:
    """Binary/float dilation of an (..., H, W) or NHWC mask.

    Equivalent to cv2.dilate with an all-ones square kernel applied
    ``iterations`` times (== one dilation with a larger window).
    """
    if iterations <= 0:
        return mask
    # n iterations of k-dilation == one (n*(k-1)+1)-dilation for box kernels
    eff = iterations * (kernel_size - 1) + 1
    pad = (kernel_size - 1) * iterations // 2 * 2  # symmetric total padding
    half = (eff - 1) // 2
    if mask.ndim == 2:
        window = (eff, eff)
        pads = ((half, eff - 1 - half), (half, eff - 1 - half))
    elif mask.ndim == 3:  # HWC
        window = (eff, eff, 1)
        pads = ((half, eff - 1 - half), (half, eff - 1 - half), (0, 0))
    elif mask.ndim == 4:  # NHWC
        window = (1, eff, eff, 1)
        pads = ((0, 0), (half, eff - 1 - half), (half, eff - 1 - half), (0, 0))
    else:
        raise ValueError(f"unsupported mask ndim {mask.ndim}")
    return lax.reduce_window(
        mask,
        -jnp.inf if jnp.issubdtype(mask.dtype, jnp.floating) else jnp.iinfo(mask.dtype).min,
        lax.max,
        window,
        (1,) * mask.ndim,
        list(pads),
    )


def erode(mask: jax.Array, kernel_size: int = 5, iterations: int = 1) -> jax.Array:
    if iterations <= 0:
        return mask
    if jnp.issubdtype(mask.dtype, jnp.floating):
        return -dilate(-mask, kernel_size, iterations)
    return mask.max() - dilate(mask.max() - mask, kernel_size, iterations)
