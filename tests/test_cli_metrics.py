"""End-to-end drive of the standalone metric CLI (cli.val_metrics) on
synthesized fixture data + random-init metric weights — the CLI surface
the reference exposes as ``src/utils/val_metrics.py:228-264``.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.fixture(scope="module")
def metric_weights(tmp_path_factory):
    from make_metric_weights import make_metric_weights

    out = tmp_path_factory.mktemp("metric_weights")
    make_metric_weights(out)
    return out


@pytest.fixture(scope="module")
def tiny_dresscode(tmp_path_factory):
    """Minimal test-split dresscode root: images + pair lists only (the
    metric CLI reads nothing else)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("dc_metrics")
    rng = np.random.default_rng(5)
    # image names are globally unique across categories in the real
    # DressCode dataset — keep the fixture faithful to that
    for ci, cat in enumerate(("dresses", "upper_body", "lower_body")):
        (root / cat / "images").mkdir(parents=True)
        pairs = []
        for i in range(2):
            im, c = f"{ci}{i:05d}_0.jpg", f"{ci}{i:05d}_1.jpg"
            pairs.append(f"{im} {c}")
            Image.fromarray(rng.integers(0, 255, (64, 48, 3),
                                         dtype=np.uint8)
                            ).save(root / cat / "images" / im, quality=95)
        (root / cat / "test_pairs_paired.txt").write_text(
            "\n".join(pairs) + "\n")
    return root


def test_val_metrics_cli_end_to_end(tmp_path, tiny_dresscode,
                                    metric_weights):
    """Drives cli.val_metrics main(): generated folder + dataset root ->
    all five metrics finite, JSON artifact written, FID of
    self-vs-self ~ 0."""
    from PIL import Image

    from ladi_vton_tpu.cli.val_metrics import main

    gen = tmp_path / "gen"
    rng = np.random.default_rng(6)
    for ci, cat in enumerate(("dresses", "upper_body", "lower_body")):
        (gen / cat).mkdir(parents=True)
        for i in range(2):
            name = f"{ci}{i:05d}_0.jpg"
            # copy the GT image for one category (self-FID sanity), noise
            # for the others
            if cat == "dresses":
                img = Image.open(tiny_dresscode / cat / "images" / name)
                img.save(gen / cat / name, quality=95)
            else:
                Image.fromarray(rng.integers(0, 255, (64, 48, 3),
                                             dtype=np.uint8)
                                ).save(gen / cat / name, quality=95)

    main([
        "--gen_folder", str(gen),
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(tiny_dresscode),
        "--test_order", "paired",
        "--category", "all",
        "--batch_size", "4",
        "--workers", "2",
        "--height", "64", "--width", "48",
        "--weights_dir", str(metric_weights),
    ])

    out = gen / "metrics_paired_all.json"
    assert out.exists()
    metrics = json.loads(out.read_text())
    for key in ("ssim_score", "lpips_score", "fid_score", "kid_score",
                "is_score"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), (key, metrics[key])
    assert metrics["is_score"] >= 1.0  # IS is exp(KL) >= 1

    # per-category run on the copied-GT category: FID/KID ~ 0, SSIM = 1
    main([
        "--gen_folder", str(gen),
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(tiny_dresscode),
        "--test_order", "paired",
        "--category", "dresses",
        "--batch_size", "4",
        "--height", "64", "--width", "48",
        "--weights_dir", str(metric_weights),
    ])
    m = json.loads((gen / "metrics_paired_dresses.json").read_text())
    assert m["ssim_score"] > 0.98
    assert m["lpips_score"] < 0.02
    assert abs(m["fid_score"]) < 1.0


def test_generate_fid_stats_cli(tmp_path, tiny_dresscode, metric_weights):
    """cli.generate_fid_stats precomputes GT Inception stats for every
    dresscode category split and is idempotent (reference
    src/utils/generate_fid_stats.py:9-40)."""
    from ladi_vton_tpu.cli.generate_fid_stats import main
    from ladi_vton_tpu.metrics.fid import StatsCache

    stats = tmp_path / "stats"
    argv = ["--dresscode_dataroot", str(tiny_dresscode),
            "--batch_size", "4",
            "--weights_dir", str(metric_weights),
            "--stats_root", str(stats)]
    main(argv)
    cache = StatsCache(stats)
    for cat in ("all", "dresses", "upper_body", "lower_body"):
        assert cache.exists(f"dresscode_{cat}"), cat
        mu, sigma, feats = cache.load(f"dresscode_{cat}")
        assert np.isfinite(mu).all() and np.isfinite(sigma).all()
        n = 6 if cat == "all" else 2
        assert feats.shape[0] == n
    main(argv)  # second run: all cached, must not recompute/crash
