"""InceptionV3 feature extractor for FID / KID / IS (Flax, NHWC).

JAX port of the Inception graph behind the reference's metric stack
(clean-fid for FID/KID, torchmetrics InceptionScore — reference:
src/utils/val_metrics.py:132-216).  ``fid_variant=True`` reproduces the
pytorch-fid/clean-fid graph modifications (avg-pool with
count_include_pad=False in A/C/E blocks; max-pool in the final E
block's pool branch); weights convert from the pytorch-fid /
torchvision checkpoints via ``convert_inception``.

NOTE on parity: clean-fid numbers are only comparable when computed
with the same weights ("pt_inception-2015-12-05") and its "clean"
bicubic-to-299 resize; this module provides the graph + resize, the
weights are converted from a user-supplied checkpoint (no network
access here).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _avg_pool_nocountpad(x: jax.Array, k: int = 3) -> jax.Array:
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1),
                               (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, (1, k, k, 1),
                               (1, 1, 1, 1), pad)
    return summed / counts


def _avg_pool_countpad(x: jax.Array, k: int = 3) -> jax.Array:
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1),
                               (1, 1, 1, 1), pad)
    return summed / (k * k)


def _max_pool(x: jax.Array, k: int, s: int, p: int = 0) -> jax.Array:
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), pad)


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=((self.padding[0], self.padding[0]),
                             (self.padding[1], self.padding[1])),
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _bc(ch, k, s=1, p=(0, 0), name=None):
    if isinstance(k, int):
        k = (k, k)
    if isinstance(p, int):
        p = (p, p)
    return BasicConv2d(ch, k, s, p, name=name)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = _bc(64, 1, name="branch1x1")(x)
        b5 = _bc(48, 1, name="branch5x5_1")(x)
        b5 = _bc(64, 5, p=2, name="branch5x5_2")(b5)
        b3 = _bc(64, 1, name="branch3x3dbl_1")(x)
        b3 = _bc(96, 3, p=1, name="branch3x3dbl_2")(b3)
        b3 = _bc(96, 3, p=1, name="branch3x3dbl_3")(b3)
        pool = (_avg_pool_nocountpad(x) if self.fid_variant
                else _avg_pool_countpad(x))
        bp = _bc(self.pool_features, 1, name="branch_pool")(pool)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(384, 3, s=2, name="branch3x3")(x)
        bd = _bc(64, 1, name="branch3x3dbl_1")(x)
        bd = _bc(96, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = _bc(96, 3, s=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _bc(192, 1, name="branch1x1")(x)
        b7 = _bc(c7, 1, name="branch7x7_1")(x)
        b7 = _bc(c7, (1, 7), p=(0, 3), name="branch7x7_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7_3")(b7)
        bd = _bc(c7, 1, name="branch7x7dbl_1")(x)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _bc(c7, (1, 7), p=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _bc(192, (1, 7), p=(0, 3), name="branch7x7dbl_5")(bd)
        pool = (_avg_pool_nocountpad(x) if self.fid_variant
                else _avg_pool_countpad(x))
        bp = _bc(192, 1, name="branch_pool")(pool)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(192, 1, name="branch3x3_1")(x)
        b3 = _bc(320, 3, s=2, name="branch3x3_2")(b3)
        b7 = _bc(192, 1, name="branch7x7x3_1")(x)
        b7 = _bc(192, (1, 7), p=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _bc(192, 3, s=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # 'avg' | 'max' (fid uses max in the 2nd E)
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = _bc(320, 1, name="branch1x1")(x)
        b3 = _bc(384, 1, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _bc(384, (1, 3), p=(0, 1), name="branch3x3_2a")(b3),
            _bc(384, (3, 1), p=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _bc(448, 1, name="branch3x3dbl_1")(x)
        bd = _bc(384, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _bc(384, (1, 3), p=(0, 1), name="branch3x3dbl_3a")(bd),
            _bc(384, (3, 1), p=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_kind == "max":
            pool = _max_pool(x, 3, 1, p=1)
        else:
            pool = (_avg_pool_nocountpad(x) if self.fid_variant
                    else _avg_pool_countpad(x))
        bp = _bc(192, 1, name="branch_pool")(pool)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool_features(B,2048), logits(B,1008|1000))."""

    fid_variant: bool = True
    num_classes: int = 1008  # TF-ported FID weights use 1008

    @nn.compact
    def __call__(self, x: jax.Array):
        """``x``: (B, 299, 299, 3) in [-1, 1] (inception normalization)."""
        x = _bc(32, 3, s=2, name="Conv2d_1a_3x3")(x)
        x = _bc(32, 3, name="Conv2d_2a_3x3")(x)
        x = _bc(64, 3, p=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = _bc(80, 1, name="Conv2d_3b_1x1")(x)
        x = _bc(192, 3, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, self.fid_variant, name="Mixed_5b")(x)
        x = InceptionA(64, self.fid_variant, name="Mixed_5c")(x)
        x = InceptionA(64, self.fid_variant, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, self.fid_variant, name="Mixed_6b")(x)
        x = InceptionC(160, self.fid_variant, name="Mixed_6c")(x)
        x = InceptionC(160, self.fid_variant, name="Mixed_6d")(x)
        x = InceptionC(192, self.fid_variant, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", self.fid_variant, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_variant else "avg",
                       self.fid_variant, name="Mixed_7c")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return pooled, logits


def convert_inception(state) -> dict:
    """pytorch-fid / torchvision inception_v3 state dict -> flax vars."""
    from ladi_vton_tpu.hub.convert import _Builder

    b = _Builder()
    flat = {}
    for key in state:
        if key.endswith(".conv.weight"):
            mod = key[: -len(".conv.weight")]
            path = tuple(mod.split("."))
            b.conv(path + ("conv",), state, mod + ".conv", bias=False)
            b.batchnorm(path + ("bn",), state, mod + ".bn")
    if "fc.weight" in state:
        b.dense(("fc",), state, "fc")
    return b.variables()


INCEPTION_NORM_MEAN = (0.485, 0.456, 0.406)  # torchvision eval transform
INCEPTION_NORM_STD = (0.229, 0.224, 0.225)


def clean_resize_to_299(images_u8: np.ndarray) -> np.ndarray:
    """clean-fid "clean" mode resize: PIL bicubic to 299x299 on uint8.

    ``images_u8``: (B, H, W, 3) uint8 -> (B, 299, 299, 3) float32 in
    [-1, 1] (the TF-inception input normalization x/127.5 - 1).
    """
    from PIL import Image

    out = np.empty((images_u8.shape[0], 299, 299, 3), np.float32)
    for i, img in enumerate(images_u8):
        pil = Image.fromarray(img).resize((299, 299), Image.BICUBIC)
        out[i] = np.asarray(pil, np.float32)
    return out / 127.5 - 1.0
