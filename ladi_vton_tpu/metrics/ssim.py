"""SSIM in jnp, matching torchmetrics defaults.

The reference computes SSIM with torchmetrics
``StructuralSimilarityIndexMeasure(data_range=1.0)``
(reference: src/utils/val_metrics.py:188): 11x11 gaussian kernel,
sigma 1.5, k1=0.01, k2=0.03, averaged over channels and batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over an NHWC batch (scalar)."""
    kernel = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    C = pred.shape[-1]
    # depthwise conv: (kh, kw, 1, C) with feature_group_count=C
    k4 = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = filt(pred)
    mu_y = filt(target)
    mu_xx = filt(pred * pred)
    mu_yy = filt(target * target)
    mu_xy = filt(pred * target)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)
