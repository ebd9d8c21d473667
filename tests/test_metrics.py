"""Metric math tests (SSIM vs torch oracle, FID/KID/IS analytics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ladi_vton_tpu.metrics.fid import (
    frechet_distance,
    gaussian_stats,
    inception_score,
    kid_mmd2,
)
from ladi_vton_tpu.metrics.ssim import ssim


def test_ssim_identical_images_is_one():
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 32, 32, 3))
        .astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_scikit_style_reference():
    # torch oracle via manual formula on a small case with uniform window
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(1, 24, 24, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    val = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0.0 < val < 1.0
    # degrading the image lowers SSIM monotonically
    c = np.clip(a + rng.normal(0, 0.3, a.shape).astype(np.float32), 0, 1)
    assert float(ssim(jnp.asarray(a), jnp.asarray(c))) < val


def test_ssim_against_torchmetrics_formula():
    try:
        from torchmetrics.functional import structural_similarity_index_measure
    except Exception:
        pytest.skip("torchmetrics not available")
    import torch

    rng = np.random.default_rng(2)
    a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = structural_similarity_index_measure(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
        data_range=1.0).item()
    assert ours == pytest.approx(theirs, abs=2e-4)


def test_frechet_distance_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 8)).astype(np.float64)
    mu, sigma = gaussian_stats(feats)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(
        0.0, abs=1e-6)


def test_frechet_distance_mean_shift():
    # diagonal covariances: FID = ||dmu||^2 + sum((s1-s2)^2) analytic
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    sigma = np.eye(4)
    assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(
        16.0, abs=1e-6)


def test_kid_near_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1024, 16))
    b = rng.standard_normal((1024, 16))
    val = kid_mmd2(a, b, num_subsets=8, subset_size=512, seed=0)
    # unbiased estimator noise is O(1/subset_size)
    assert abs(val) < 0.02


def test_kid_positive_for_different_distributions():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((128, 16))
    b = rng.standard_normal((128, 16)) + 1.0
    val = kid_mmd2(a, b, num_subsets=8, subset_size=64)
    assert val > 0.1


def test_inception_score_uniform_vs_confident():
    n, c = 100, 10
    uniform_logits = np.zeros((n, c))
    confident = np.full((n, c), -20.0)
    confident[np.arange(n), np.arange(n) % c] = 20.0
    is_uniform, _ = inception_score(uniform_logits, splits=2)
    is_conf, _ = inception_score(confident, splits=2)
    assert is_uniform == pytest.approx(1.0, abs=1e-3)
    assert is_conf > 5.0


def test_inception_v3_tiny_forward():
    """Graph sanity: fid-variant InceptionV3 produces 2048-d pool3."""
    import jax

    from ladi_vton_tpu.metrics.inception import InceptionV3

    model = InceptionV3(fid_variant=True)
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.key(0), x)
    pooled, logits = model.apply(params, x)
    assert pooled.shape == (1, 2048)
    assert logits.shape == (1, 1008)


def test_lpips_zero_for_identical():
    import jax

    from ladi_vton_tpu.metrics.lpips import LPIPS

    model = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x, x)
    val = float(model.apply(params, x, x))
    assert val == pytest.approx(0.0, abs=1e-6)
