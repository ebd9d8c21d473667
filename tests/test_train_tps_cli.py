"""train_tps CLI: per-epoch eval, resume-continues-training, extraction.

The round-1 gap this covers: resume used to skip ALL remaining epochs
straight to extraction; the reference continues at the stored epoch
(reference src/train_tps.py:404-414).  Also asserts the per-epoch
paired+unpaired eval (compute_metric equivalent, :455-515) logs losses
and sample grids.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image


@pytest.fixture(scope="module")
def dresscode_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dresscode_tps")
    rng = np.random.default_rng(0)
    kpts = np.concatenate([
        rng.uniform([100, 100], [300, 400], size=(18, 2)),
        np.ones((18, 2))], axis=1)
    for cat in ("upper_body", "lower_body", "dresses"):
        croot = root / cat
        for sub in ("images", "masks", "label_maps", "keypoints"):
            (croot / sub).mkdir(parents=True)
        pairs = []
        for i in range(2):
            im, c = f"{i:06d}_0.jpg", f"{i:06d}_1.jpg"
            pairs.append(f"{im} {c}")
            g = np.random.default_rng(i)
            for name in (im, c):
                Image.fromarray(g.integers(
                    0, 255, (64, 48, 3), dtype=np.uint8)).save(
                    croot / "images" / name)
            Image.fromarray((g.uniform(size=(64, 48)) > 0.5).astype(
                np.uint8) * 255).save(
                croot / "masks" / c.replace(".jpg", ".png"))
            Image.fromarray(g.integers(0, 18, (64, 48), dtype=np.uint8),
                            mode="L").save(
                croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
            with open(croot / "keypoints"
                      / im.replace("_0.jpg", "_2.json"), "w") as f:
                json.dump({"keypoints": kpts.tolist()}, f)
        for fname in ("train_pairs.txt", "test_pairs_paired.txt",
                      "test_pairs_unpaired.txt"):
            with open(croot / fname, "w") as f:
                f.write("\n".join(pairs) + "\n")
    return root


def _run(root, ckpt_dir, save_path, epochs_tps, epochs_ref, extra=()):
    from ladi_vton_tpu.cli.train_tps import main

    main([
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(root),
        "--checkpoints_dir", str(ckpt_dir),
        "--exp_name", "t",
        "--batch_size", "2",
        "--workers", "0",
        "--height", "64", "--width", "48",
        "--epochs_tps", str(epochs_tps),
        "--epochs_refinement", str(epochs_ref),
        "--save_path", str(save_path),
        *extra,
    ])


def test_train_tps_eval_resume_and_extraction(dresscode_root, tmp_path):
    ckpt_dir = tmp_path / "ckpts"
    save_path = tmp_path / "cache"
    exp = ckpt_dir / "t"

    # 1 TPS epoch, no refinement: checkpoint-1 + eval logs + extraction
    _run(dresscode_root, ckpt_dir, save_path, 1, 0)
    assert (exp / "checkpoint-1").exists()
    lines = [json.loads(li) for li in
             open(exp / "metrics.jsonl").read().splitlines()]
    tagged = [li for li in lines if "eval/eval_loss_paired" in li]
    assert tagged, "per-epoch eval losses must be logged"
    assert "eval/eval_loss_unpaired" in tagged[-1]
    assert "train/l1_loss" in tagged[-1]
    grids = list((exp / "samples").glob("images_paired_*"))
    assert grids, "eval image grids must be dumped"
    warped = list((save_path / "warped_cloths" / "dresscode"
                   / "upper_body").glob("*"))
    assert warped, "extraction must write the warped-cloth cache"

    # resume mid-phase-A: epochs_tps now 2 -> ONE more TPS epoch trains
    # (round-1 bug: this used to skip straight to extraction)
    _run(dresscode_root, ckpt_dir, save_path, 2, 0)
    assert (exp / "checkpoint-2").exists()

    # resume into phase B: one refinement epoch on top
    _run(dresscode_root, ckpt_dir, save_path, 2, 1)
    assert (exp / "checkpoint-3").exists()
    lines = [json.loads(li) for li in
             open(exp / "metrics.jsonl").read().splitlines()]
    ref_logs = [li for li in lines if li.get("train/vgg_loss", 0) > 0]
    assert ref_logs, "phase B must log VGG training loss"
