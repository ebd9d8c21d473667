"""Metric numeric-parity harness.

Two layers of evidence that the JAX/numpy metric suite matches the
reference's clean-fid + torchmetrics numbers
(reference: src/utils/val_metrics.py:105-225):

1. independent oracles that ALWAYS run — each metric checked against a
   from-scratch implementation that shares no code path (explicit
   sliding windows, eigendecompositions, O(n^2) kernel loops);
2. library-parity tests that run when clean-fid / torchmetrics are
   importable (skipped otherwise — they are not part of this image),
   comparing on a fixed synthetic image folder with the tolerances the
   round-1 verdict asked for (FID ~0.1, SSIM/LPIPS ~1e-3).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from ladi_vton_tpu.metrics.fid import (
    frechet_distance,
    gaussian_stats,
    inception_score,
    kid_mmd2,
)
from ladi_vton_tpu.metrics.ssim import ssim

# --------------------------------------------------------------------
# 1. independent oracles (always run)


def test_frechet_distance_matches_eigendecomposition_oracle():
    """Tr(sqrt(S1 S2)) == sum sqrt(eig(S1^1/2 S2 S1^1/2)) — an oracle
    that never touches scipy.linalg.sqrtm (the implementation's path),
    on non-commuting full covariances."""
    rng = np.random.default_rng(0)
    d = 16
    a = rng.standard_normal((200, d))
    b = rng.standard_normal((200, d)) @ rng.standard_normal((d, d)) * 0.3
    mu1, s1 = gaussian_stats(a)
    mu2, s2 = gaussian_stats(b)

    # oracle: S1^(1/2) via eigh, then eigvals of S1^(1/2) S2 S1^(1/2)
    w, v = np.linalg.eigh(s1)
    s1_half = v @ np.diag(np.sqrt(np.clip(w, 0, None))) @ v.T
    inner = s1_half @ s2 @ s1_half
    tr_sqrt = np.sqrt(np.clip(np.linalg.eigvalsh(inner), 0, None)).sum()
    diff = mu1 - mu2
    expect = diff @ diff + np.trace(s1) + np.trace(s2) - 2 * tr_sqrt

    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_kid_matches_double_loop_oracle():
    """Full-set KID (subset = everything) against an explicit O(n^2)
    per-pair loop — permutation-invariant, so the estimator's internal
    shuffling cannot matter."""
    rng = np.random.default_rng(1)
    n, d = 24, 8
    f1 = rng.standard_normal((n, d))
    f2 = rng.standard_normal((n, d)) + 0.5

    def k(x, y):
        return (x @ y / d + 1.0) ** 3

    kxx = sum(k(f2[i], f2[j]) for i in range(n) for j in range(n)
              if i != j) / (n * (n - 1))
    kyy = sum(k(f1[i], f1[j]) for i in range(n) for j in range(n)
              if i != j) / (n * (n - 1))
    kxy = sum(k(f2[i], f1[j]) for i in range(n)
              for j in range(n)) / (n * n)
    expect = kxx + kyy - 2 * kxy

    got = kid_mmd2(f1, f2, num_subsets=1, subset_size=n, seed=0)
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_inception_score_matches_explicit_kl_oracle():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((30, 6))
    got, _ = inception_score(logits, splits=3)

    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    scores = []
    for chunk in np.array_split(probs, 3):
        marg = chunk.mean(0)
        kl = np.mean([
            sum(p[c] * (np.log(p[c] + 1e-16) - np.log(marg[c] + 1e-16))
                for c in range(6))
            for p in chunk
        ])
        scores.append(np.exp(kl))
    np.testing.assert_allclose(got, np.mean(scores), rtol=1e-6)


def test_ssim_matches_sliding_window_oracle():
    """jnp SSIM (lax depthwise conv) vs an explicit python sliding
    window with the torchmetrics constants (11x11 gaussian, sigma 1.5,
    k1=.01, k2=.03, data_range 1)."""
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(1, 20, 20, 2)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    size, sigma = 11, 1.5
    coords = np.arange(size) - (size - 1) / 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):  # img (H, W) -> valid-windowed means
        H, W = img.shape
        out = np.empty((H - size + 1, W - size + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = (img[i:i + size, j:j + size] * win).sum()
        return out

    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for ch in range(2):
        x, y = a[0, :, :, ch].astype(np.float64), b[0, :, :, ch].astype(
            np.float64)
        mx, my = filt(x), filt(y)
        sx = filt(x * x) - mx * mx
        sy = filt(y * y) - my * my
        sxy = filt(x * y) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)
             / ((mx**2 + my**2 + c1) * (sx + sy + c2)))
        vals.append(s.mean())
    expect = np.mean(vals)

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


# --------------------------------------------------------------------
# 2. library parity (gated: clean-fid / torchmetrics not in this image)


def _synth_image_folders(tmp_path, n=64, size=(64, 48)):
    from PIL import Image

    rng = np.random.default_rng(0)
    gen_dir = tmp_path / "gen"
    gt_dir = tmp_path / "gt"
    gen_dir.mkdir()
    gt_dir.mkdir()
    for i in range(n):
        base = rng.uniform(0, 1, (*size, 3))
        noisy = np.clip(base + rng.normal(0, 0.1, base.shape), 0, 1)
        Image.fromarray((base * 255).astype(np.uint8)).save(
            gt_dir / f"{i:04d}.png")
        Image.fromarray((noisy * 255).astype(np.uint8)).save(
            gen_dir / f"{i:04d}.png")
    return gen_dir, gt_dir


def test_ssim_parity_vs_torchmetrics_on_folder(tmp_path):
    tm = pytest.importorskip("torchmetrics.functional")
    import torch

    gen_dir, gt_dir = _synth_image_folders(tmp_path)
    from PIL import Image

    a = np.stack([np.asarray(Image.open(p), np.float32) / 255
                  for p in sorted(gen_dir.iterdir())])
    b = np.stack([np.asarray(Image.open(p), np.float32) / 255
                  for p in sorted(gt_dir.iterdir())])
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = tm.structural_similarity_index_measure(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2), data_range=1.0).item()
    assert ours == pytest.approx(theirs, abs=1e-3)


def test_fid_parity_vs_cleanfid_on_folder(tmp_path):
    cleanfid = pytest.importorskip("cleanfid")
    import os

    if not os.environ.get("LADI_VTON_METRIC_WEIGHTS"):
        pytest.skip("needs Inception weights for the JAX side")
    gen_dir, gt_dir = _synth_image_folders(tmp_path, n=128)
    from ladi_vton_tpu.metrics.compute import fid_between_folders

    ours = fid_between_folders(str(gen_dir), str(gt_dir))
    theirs = cleanfid.fid.compute_fid(str(gen_dir), str(gt_dir),
                                      mode="clean")
    assert ours == pytest.approx(theirs, abs=0.1)
