"""LPIPS (AlexNet backbone) in Flax.

Equivalent of the reference's torchmetrics
``LearnedPerceptualImagePatchSimilarity(net='alex', normalize=True)``
(reference: src/utils/val_metrics.py:191): AlexNet relu1-5 features,
channel-unit-normalized, squared difference, learned 1x1 heads
(lin0..lin4, bias-free), spatial mean, summed over layers.  Inputs in
[0, 1] are rescaled to [-1, 1] then passed through LPIPS's scaling
layer.  Weights (AlexNet convs + lin heads) convert from the published
LPIPS checkpoint via ``convert_lpips``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# (name, out_ch, kernel, stride, pad, maxpool_before)
_ALEX = (
    ("conv_0", 64, 11, 4, 2, False),
    ("conv_1", 192, 5, 1, 2, True),
    ("conv_2", 384, 3, 1, 1, True),
    ("conv_3", 256, 3, 1, 1, False),
    ("conv_4", 256, 3, 1, 1, False),
)


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        for name, ch, k, s, p, pool in _ALEX:
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=name)(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array,
                 *, normalize: bool = True) -> jax.Array:
        """Mean LPIPS distance over an NHWC batch (scalar)."""
        if normalize:  # [0,1] -> [-1,1]
            img0 = img0 * 2.0 - 1.0
            img1 = img1 * 2.0 - 1.0
        shift = jnp.asarray(_SHIFT, img0.dtype)
        scale = jnp.asarray(_SCALE, img0.dtype)
        net = AlexNetFeatures(name="net")
        f0 = net((img0 - shift) / scale)
        f1 = net((img1 - shift) / scale)
        total = jnp.zeros((img0.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(
                jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(
                jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False,
                           name=f"lin_{i}")(diff)
            total = total + jnp.mean(head, axis=(1, 2, 3))
        return jnp.mean(total)


def convert_lpips(state) -> dict:
    """LPIPS checkpoint (torchmetrics/lpips package layout) -> flax vars.

    Expects keys like ``net.slice{K}.{idx}.weight`` (AlexNet convs at
    torchvision indices 0,3,6,8,10) and ``lins.{i}.model.1.weight``.
    """
    from ladi_vton_tpu.hub.convert import _Builder, _conv_kernel, _set

    b = _Builder()
    # alexnet conv torchvision feature indices in order
    tv_idx = (0, 3, 6, 8, 10)
    for i, ti in enumerate(tv_idx):
        for prefix in (f"net.features.{ti}", f"net.slice{i + 1}.{ti}"):
            if f"{prefix}.weight" in state:
                b.conv(("net", f"conv_{i}"), state, prefix)
                break
    for i in range(5):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if key in state:
                _set(b.params, (f"lin_{i}", "kernel"),
                     _conv_kernel(state[key]))
                break
    return b.variables()
