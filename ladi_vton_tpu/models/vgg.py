"""VGG19 feature tower + perceptual loss.

Equivalent of the reference's torchvision-based VGG loss
(reference: src/utils/vgg_loss.py:7-68): feature taps at relu1_1,
relu2_1, relu3_1, relu4_1, relu5_1 (torchvision ``features`` indices
2/7/12/21/30 slice boundaries), weighted L1 with weights
[1/32, 1/16, 1/8, 1/4, 1], inputs short-side-resized to 256 and
ImageNet-normalized.  Conv modules are named ``conv_<torchvision
feature index>`` so the torchvision VGG19 checkpoint converts by name
via ``hub.convert``; the loss also runs with random weights in tests.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.ops.resize import resize_bilinear

# (torchvision feature index, out_channels, preceded_by_pool)
_CONVS = (
    (0, 64, False),    # conv1_1 -> tap 0 after relu
    (2, 64, False),    # conv1_2
    (5, 128, True),    # conv2_1 -> tap 1
    (7, 128, False),   # conv2_2
    (10, 256, True),   # conv3_1 -> tap 2
    (12, 256, False),  # conv3_2
    (14, 256, False),  # conv3_3
    (16, 256, False),  # conv3_4
    (19, 512, True),   # conv4_1 -> tap 3
    (21, 512, False),  # conv4_2
    (23, 512, False),  # conv4_3
    (25, 512, False),  # conv4_4
    (28, 512, True),   # conv5_1 -> tap 4
)
_TAP_INDICES = (0, 5, 10, 19, 28)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """Returns the relu{1..5}_1 activations used by the perceptual loss."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        h = x.astype(self.dtype)
        for tv_idx, width, pooled in _CONVS:
            if pooled:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv_{tv_idx}")(h)
            h = nn.relu(h)
            if tv_idx in _TAP_INDICES:
                feats.append(h)
        return feats


def vgg_preprocess(x: jax.Array) -> jax.Array:
    """[-1, 1] NHWC image -> short-side-256, ImageNet-normalized input.

    Mirrors reference vgg_loss.py:54-62 (torchvision Resize(256)).  The
    reference resize uses antialias; both operands of the L1 go through
    the same resize here so the loss stays well-posed.
    """
    H, W = x.shape[1], x.shape[2]
    short = min(H, W)
    scale = 256 / short
    out_hw = (int(round(H * scale)), int(round(W * scale)))
    x = resize_bilinear(x, out_hw)
    x = (x + 1.0) * 0.5
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def vgg_loss(
    vgg: VGG19Features,
    params,
    pred: jax.Array,
    target: jax.Array,
    weights: Sequence[float] = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0),
) -> jax.Array:
    """Weighted L1 over the 5 feature taps (reference vgg_loss.py:64-68)."""
    f_pred = vgg.apply(params, vgg_preprocess(pred))
    f_tgt = vgg.apply(params, vgg_preprocess(target))
    total = jnp.asarray(0.0, jnp.float32)
    for w, a, b in zip(weights, f_pred, f_tgt):
        total = total + w * jnp.mean(
            jnp.abs(a.astype(jnp.float32) - jax.lax.stop_gradient(
                b.astype(jnp.float32)))
        )
    return total
