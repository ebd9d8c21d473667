"""Fused nearest-2x-upsample + 3x3 conv as four low-res phase convs.

The diffusers Upsample2D pattern — ``repeat(x, 2, 2)`` then a 3x3 conv —
appears on the UNet up path (inside the 50-step denoise scan) and three
times in the VAE decoder (reference consumes it via diffusers
``get_up_block``, src/models/vae.py:22-23).  Materializing the 4x
upsampled tensor costs a full extra HBM round-trip and runs the conv at
high resolution (36*C*O FLOPs per low-res pixel).

Because nearest upsampling duplicates pixels, the 3x3 conv over the
upsampled image collapses exactly onto the low-res grid: each output
phase (a, b) in {0,1}^2 sees a 2x2 window of the *low-res* input with
kernel taps summed where duplicated pixels coincide:

  rows, phase a=0: taps (i-1, i) with weights (W[0], W[1]+W[2])
  rows, phase a=1: taps (i, i+1) with weights (W[0]+W[1], W[2])

(and identically over columns).  Four 2x2 convs at low resolution =
16*C*O FLOPs per low-res pixel — 2.25x fewer — with no intermediate
tensor; the results interleave back with a reshape.  The math is exact
(the same products, reassociated), so this is numerics-safe on every
backend, not a TPU-only fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _fold_rows(w: jax.Array):
    """(3, kw, C, O) -> phase kernels ((2, kw, C, O), (2, kw, C, O))."""
    a0 = jnp.stack([w[0], w[1] + w[2]])
    a1 = jnp.stack([w[0] + w[1], w[2]])
    return a0, a1


def nearest_up2_conv3x3(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None
) -> jax.Array:
    """Equivalent of ``conv3x3(pad=1)(nearest_upsample_2x(x))``.

    x: (B, H, W, C) NHWC; kernel: (3, 3, C, O) HWIO; bias: (O,) or None.
    Returns (B, 2H, 2W, O).
    """
    B, H, W, C = x.shape
    assert kernel.shape[:2] == (3, 3), kernel.shape
    O = kernel.shape[-1]

    row0, row1 = _fold_rows(kernel)
    phases = {}
    for a, wr in ((0, row0), (1, row1)):
        # fold columns: (2, 3, C, O) -> two (2, 2, C, O)
        c0, c1 = _fold_rows(jnp.swapaxes(wr, 0, 1))
        phases[(a, 0)] = jnp.swapaxes(c0, 0, 1)
        phases[(a, 1)] = jnp.swapaxes(c1, 0, 1)

    dn = lax.conv_dimension_numbers(x.shape, (2, 2, C, O),
                                    ("NHWC", "HWIO", "NHWC"))

    def phase_conv(a, b):
        pad_r = (1, 0) if a == 0 else (0, 1)
        pad_c = (1, 0) if b == 0 else (0, 1)
        return lax.conv_general_dilated(
            x, phases[(a, b)], window_strides=(1, 1),
            padding=(pad_r, pad_c), dimension_numbers=dn,
            preferred_element_type=x.dtype)

    y00, y01 = phase_conv(0, 0), phase_conv(0, 1)
    y10, y11 = phase_conv(1, 0), phase_conv(1, 1)
    # interleave: out[2i+a, 2j+b] = y_ab[i, j]
    rows = jnp.stack([jnp.stack([y00, y01], axis=3),
                      jnp.stack([y10, y11], axis=3)], axis=2)
    out = rows.reshape(B, 2 * H, 2 * W, O)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
