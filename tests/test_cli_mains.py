"""End-to-end drives of the flagship CLI mains (VERDICT r3 item 3).

The reference's flagship call stack is ``inference.py main()`` (hub
weights -> dataset -> conditioning -> try-on pipeline -> save ->
metrics; reference src/inference.py:100-343) and ``eval.py main()``
(local checkpoints; src/eval.py).  These tests run each main() AS ONE
PROCESS over synthesized tiny-tower weights
(``tools/make_weights.make_weights(tiny=True)`` — SD-2 file layout +
the four .pth releases + config sidecars the zoo derives architectures
from) and the synthesized DressCode fixture: zoo load -> dataset ->
conditioning -> pipeline -> image save -> --compute_metrics JSON, all
asserted.

Slow tier: tiny towers, but the warping stage is the reference's fixed
full-size architecture and the metric towers are full-size.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

H, W = 256, 192  # divisible by 64 (3 UNet downsamples below latents)


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    from make_weights import make_weights

    out = tmp_path_factory.mktemp("tiny_weights")
    # keep the torch->flax conversion cache inside the test tree
    os.environ["LADI_VTON_CACHE"] = str(out / "convert_cache")
    make_weights(out, tiny=True, dataset="dresscode", verbose=False)
    return out


@pytest.fixture(scope="module")
def metric_weights(tmp_path_factory):
    from make_metric_weights import make_metric_weights

    out = tmp_path_factory.mktemp("metric_weights")
    make_metric_weights(out)
    os.environ["LADI_VTON_METRIC_WEIGHTS"] = str(out)
    return out


def _keypoints_384x512(rng, n=18):
    pts = rng.uniform([100, 100], [300, 400], size=(n, 2))
    return np.concatenate([pts, np.ones((n, 2))], axis=1)


@pytest.fixture(scope="module")
def dresscode_root(tmp_path_factory):
    """Test-split DressCode layout (one category) + the warped-cloth
    cache the eval path reads (stage-1 extraction output,
    reference dresscode.py:139-156)."""
    base = tmp_path_factory.mktemp("dc_cli")
    root = base / "dresscode"
    cat = "upper_body"
    croot = root / cat
    for sub in ("images", "masks", "label_maps", "keypoints"):
        (croot / sub).mkdir(parents=True)
    warp_cache = base / "cache" / "warped_cloths" / "dresscode" / cat
    warp_cache.mkdir(parents=True)
    rng = np.random.default_rng(3)
    pairs = []
    for i in range(2):
        im, c = f"{i:06d}_0.jpg", f"{i:06d}_1.jpg"
        pairs.append(f"{im} {c}")
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(croot / "images" / im, quality=95)
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(croot / "images" / c, quality=95)
        Image.fromarray((rng.uniform(size=(H, W)) > 0.5).astype(np.uint8)
                        * 255).save(croot / "masks"
                                    / c.replace(".jpg", ".png"))
        Image.fromarray(rng.integers(0, 18, (H, W), dtype=np.uint8),
                        mode="L").save(
            croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
        with open(croot / "keypoints" / im.replace("_0.jpg", "_2.json"),
                  "w") as f:
            json.dump({"keypoints": _keypoints_384x512(rng).tolist()}, f)
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(warp_cache / f"{im[:-4]}_{c}", "JPEG",
                               quality=95)
    (croot / "test_pairs_paired.txt").write_text("\n".join(pairs) + "\n")
    # unpaired order: each model with the OTHER item's cloth
    unpaired = [f"{pairs[0].split()[0]} {pairs[1].split()[1]}",
                f"{pairs[1].split()[0]} {pairs[0].split()[1]}"]
    (croot / "test_pairs_unpaired.txt").write_text(
        "\n".join(unpaired) + "\n")
    return root


def test_inference_cli_main_end_to_end(tmp_path, tiny_weights,
                                       metric_weights, dresscode_root):
    """cli.inference main() as one process: zoo (tiny sidecar configs +
    conv_in 9->31 surgery) -> DressCode dataset -> TPS/refine/CLIP/PTE
    conditioning -> 2-step try-on pipeline -> per-category saves ->
    --compute_metrics JSON with all five metrics finite."""
    from ladi_vton_tpu.cli.inference import main

    out = tmp_path / "inf_out"
    main([
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(dresscode_root),
        "--test_order", "paired",
        "--category", "upper_body",
        "--output_dir", str(out),
        "--batch_size", "2",
        "--num_inference_steps", "2",
        "--num_workers", "1",
        "--height", str(H), "--width", str(W),
        "--checkpoint_dir", str(tiny_weights / "ladi"),
        "--sd2_model_dir", str(tiny_weights / "sd2"),
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--compute_metrics",
    ])
    save_dir = out / "paired"
    for i in range(2):
        img_path = save_dir / "upper_body" / f"{i:06d}_0.jpg"
        assert img_path.exists(), img_path
        arr = np.asarray(Image.open(img_path))
        assert arr.shape == (H, W, 3)
        assert arr.std() > 0  # not a constant frame
    metrics_path = save_dir / "metrics_paired_upper_body.json"
    assert metrics_path.exists()
    metrics = json.loads(metrics_path.read_text())
    for key in ("ssim_score", "lpips_score", "fid_score", "kid_score",
                "is_score"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)


def test_eval_cli_main_end_to_end(tmp_path, tiny_weights, metric_weights,
                                  dresscode_root):
    """cli.eval main() as one process: local .pth checkpoints resolved
    by name -> dataset with the warped-cloth cache -> DPM-2-step try-on
    via --scheduler dpm -> saves + metrics JSON."""
    from ladi_vton_tpu.cli.eval import main

    ladi = tiny_weights / "ladi"
    out = tmp_path / "eval_out"
    main([
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(dresscode_root),
        "--test_order", "paired",
        "--category", "upper_body",
        "--output_dir", str(out),
        "--save_name", "tiny_eval",
        "--batch_size", "2",
        "--num_inference_steps", "2",
        "--scheduler", "dpm",
        "--num_workers", "1",
        "--height", str(H), "--width", str(W),
        "--unet_dir", str(ladi), "--unet_name", "unet_dresscode.pth",
        "--emasc_dir", str(ladi), "--emasc_name", "emasc_dresscode.pth",
        "--inversion_adapter_dir", str(ladi),
        "--inversion_adapter_name", "inversion_adapter_dresscode.pth",
        "--sd2_model_dir", str(tiny_weights / "sd2"),
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--compute_metrics",
    ])
    save_dir = out / "tiny_eval" / "paired"
    for i in range(2):
        img_path = save_dir / "upper_body" / f"{i:06d}_0.jpg"
        assert img_path.exists(), img_path
        assert np.asarray(Image.open(img_path)).shape == (H, W, 3)
    metrics_path = save_dir / "metrics_paired_upper_body.json"
    assert metrics_path.exists()
    metrics = json.loads(metrics_path.read_text())
    assert np.isfinite(metrics["fid_score"])


def test_quality_gate_smoke(tmp_path, tiny_weights, metric_weights,
                            dresscode_root, capsys):
    """tools/quality_gate.py --smoke (VERDICT r4 item 5): the turnkey
    real-weights runbook executes end-to-end on tiny towers — its arg
    wiring reaches cli.inference unmangled, the metrics JSON lands where
    the gate reader expects, and the dresscode/unpaired paper gates
    (FID/KID) are EVALUATED (outcome informational: random weights)."""
    import quality_gate

    out = tmp_path / "qg_out"
    quality_gate.main([
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(dresscode_root),
        "--sd2_model_dir", str(tiny_weights / "sd2"),
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--checkpoint_dir", str(tiny_weights / "ladi"),
        "--metric_weights", str(metric_weights),
        "--test_order", "unpaired",
        "--category", "upper_body",
        "--batch_size", "2",
        "--num_inference_steps", "2",
        "--num_workers", "1",
        "--height", str(H), "--width", str(W),
        "--output_dir", str(out),
        "--smoke",
    ])
    text = capsys.readouterr().out
    assert "fid_score" in text and "kid_score" in text, text
    assert ("PASS" in text or "FAIL" in text), text  # gates evaluated
    metrics_file = (out / "unpaired"
                    / "metrics_unpaired_upper_body.json")
    assert metrics_file.exists()


def test_hubconf_entry_points(tiny_weights):
    """Root hubconf.py (the reference's public zoo surface,
    hubconf.py:16-64): the four entry points build modules + converted
    variables from the release-layout .pth files."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import hubconf

    ladi = str(tiny_weights / "ladi")
    unet, unet_vars = hubconf.extended_unet("dresscode",
                                            checkpoint_dir=ladi)
    assert unet.config.in_channels == 31  # surgery applied
    em, em_vars = hubconf.emasc("dresscode", checkpoint_dir=ladi)
    ia, ia_vars = hubconf.inversion_adapter("dresscode",
                                            checkpoint_dir=ladi)
    (tps, tps_vars), (ref, ref_vars) = hubconf.warping_module(
        "dresscode", checkpoint_dir=ladi)
    for v in (unet_vars, em_vars, ia_vars, tps_vars, ref_vars):
        assert v  # non-empty converted trees
