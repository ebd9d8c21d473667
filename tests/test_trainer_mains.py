"""End-to-end drives of the three diffusion trainer CLI mains
(VERDICT r4 item 1).

These are the scripts that produced the reference's released weights
(reference src/train_vto.py:211-742, train_emasc.py:180-489,
train_inversion_adapter.py:190-604).  Each main() runs AS ONE PROCESS
over synthesized tiny towers + a synthesized DressCode fixture for a few
steps with ``checkpointing_steps=2``, asserting the orbax checkpoint,
keep-N GC, the validation hook firing (generated images on disk), and
the raw ``.pth`` export with its architecture sidecar.  The circle
closes by feeding train_vto's exported ``unet_{step}.pth`` (+ adapter +
emasc exports) into ``cli.eval main()`` and asserting it generates.

Also covered: ``--resume_from_checkpoint latest`` (exact step math),
``--async_checkpointing`` (adapter trainer), and ``--tensor_parallel 2``
(vto trainer) on the 8-device CPU mesh.
"""

import json
import logging
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

H = W = 64  # divisible by 64 (VAE /8 then 3 UNet downsamples)
CATS = ("upper_body", "lower_body", "dresses")


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    import os

    from make_weights import make_weights

    out = tmp_path_factory.mktemp("tiny_weights_train")
    os.environ["LADI_VTON_CACHE"] = str(out / "convert_cache")
    make_weights(out, tiny=True, dataset="dresscode", verbose=False)
    return out


@pytest.fixture(scope="module")
def dresscode_root(tmp_path_factory):
    """Train + test DressCode splits (all three categories) plus the
    warped-cloth cache both splits read (reference
    dresscode.py:139-156)."""
    base = tmp_path_factory.mktemp("dc_train")
    root = base / "dresscode"
    rng = np.random.default_rng(7)
    kpts = np.concatenate([rng.uniform([100, 100], [300, 400], (18, 2)),
                           np.ones((18, 2))], axis=1)
    for cat in CATS:
        croot = root / cat
        for sub in ("images", "masks", "label_maps", "keypoints"):
            (croot / sub).mkdir(parents=True)
        cache = base / "cache" / "warped_cloths" / "dresscode" / cat
        cache.mkdir(parents=True)
        pairs = []
        for i in range(3):
            im, c = f"{i:06d}_0.jpg", f"{i:06d}_1.jpg"
            pairs.append(f"{im} {c}")
            for name in (im, c):
                Image.fromarray(rng.integers(0, 255, (H, W, 3),
                                             dtype=np.uint8)).save(
                    croot / "images" / name, quality=95)
            Image.fromarray((rng.uniform(size=(H, W)) > 0.5).astype(
                np.uint8) * 255).save(
                croot / "masks" / c.replace(".jpg", ".png"))
            Image.fromarray(rng.integers(0, 18, (H, W), dtype=np.uint8),
                            mode="L").save(
                croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
            with open(croot / "keypoints"
                      / im.replace("_0.jpg", "_2.json"), "w") as f:
                json.dump({"keypoints": kpts.tolist()}, f)
            Image.fromarray(rng.integers(0, 255, (H, W, 3),
                                         dtype=np.uint8)).save(
                cache / f"{im[:-4]}_{c}", "JPEG", quality=95)
        (croot / "train_pairs.txt").write_text("\n".join(pairs) + "\n")
        # test split reuses the first two pairs
        (croot / "test_pairs_paired.txt").write_text(
            "\n".join(pairs[:2]) + "\n")
    return root


def _common(root, weights, out, max_steps=2):
    return [
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(root),
        "--output_dir", str(out),
        "--train_batch_size", "8",  # one 8-device data axis worth
        "--test_batch_size", "8",
        "--max_train_steps", str(max_steps),
        "--checkpointing_steps", "2",
        "--num_workers", "0", "--num_workers_test", "0",
        "--test_order", "paired",
        "--height", str(H), "--width", str(W),
        "--report_to", "none",
        "--sd2_model_dir", str(weights / "sd2"),
    ]


def test_train_emasc_main_and_resume(tmp_path, tiny_weights,
                                     dresscode_root, caplog):
    """cli.train_emasc main() as one process: tiny VAE -> derived EMASC
    channel plan -> jitted L1+VGG steps -> checkpoint-2 + emasc_2.pth
    export + sidecar + validation reconstruction dumps; then resume from
    latest continues at step 2 (exact step math) to checkpoint-4."""
    from ladi_vton_tpu.cli.train_emasc import main

    out = tmp_path / "emasc_out"
    main(_common(dresscode_root, tiny_weights, out))
    assert (out / "checkpoint-2").exists()
    assert (out / "emasc_2.pth").exists()
    side = json.loads((out / "emasc_2.config.json").read_text())
    assert side["in_channels"] == [32, 32, 32, 32, 64]  # derived plan
    assert side["out_channels"] == [32, 32, 64, 64, 64]
    val_imgs = list((out / "imgs_step_2" / "paired").rglob("*.jpg")) + \
        list((out / "imgs_step_2" / "paired").rglob("*.png"))
    assert val_imgs, "validation hook must dump VAE reconstructions"
    recon = np.asarray(Image.open(val_imgs[0]))
    assert recon.std() > 0  # not a constant frame

    # resume: continues AT step 2, trains 2 more, GC keeps last 2
    caplog.set_level(logging.INFO)
    main(_common(dresscode_root, tiny_weights, out, max_steps=4)
         + ["--resume_from_checkpoint", "latest"])
    assert "resumed from step 2" in caplog.text
    assert (out / "checkpoint-4").exists()
    steps = sorted(int(p.name.split("-")[1])
                   for p in out.glob("checkpoint-*"))
    assert len(steps) <= 2 and steps[-1] == 4  # keep-2 GC held


def test_train_vto_main_circle_to_eval(tmp_path, tiny_weights,
                                       dresscode_root):
    """cli.train_vto main() as one process (conv_in 9->31 surgery on the
    stock sd2/unet, PTE text path, adapter co-training), then the
    exported unet_2.pth / inversion_adapter_2.pth / sidecars feed
    cli.eval main() which generates images — the train->export->eval
    circle the reference's release pipeline depends on."""
    from ladi_vton_tpu.cli.eval import main as eval_main
    from ladi_vton_tpu.cli.train_vto import main

    out = tmp_path / "vto_out"
    ladi = tiny_weights / "ladi"
    main(_common(dresscode_root, tiny_weights, out) + [
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--inversion_adapter_dir", str(ladi),
        "--train_inversion_adapter",
    ])
    assert (out / "checkpoint-2").exists()
    assert (out / "unet_2.pth").exists()
    side = json.loads((out / "unet_2.config.json").read_text())
    assert side["in_channels"] == 31  # surgery captured in the sidecar
    assert (out / "inversion_adapter_2.pth").exists()
    val = list((out / "imgs_step_2" / "paired").rglob("*.jpg"))
    assert val, "validation must generate try-on images"

    eval_out = tmp_path / "eval_out"
    eval_main([
        "--dataset", "dresscode",
        "--dresscode_dataroot", str(dresscode_root),
        "--test_order", "paired",
        "--output_dir", str(eval_out),
        "--save_name", "circle",
        "--batch_size", "8",
        "--num_inference_steps", "2",
        "--num_workers", "0",
        "--height", str(H), "--width", str(W),
        "--unet_dir", str(out), "--unet_name", "unet_2.pth",
        "--inversion_adapter_dir", str(out),
        "--inversion_adapter_name", "inversion_adapter_2.pth",
        "--emasc_dir", str(ladi), "--emasc_name", "emasc_dresscode.pth",
        "--sd2_model_dir", str(tiny_weights / "sd2"),
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
    ])
    imgs = list((eval_out / "circle" / "paired").rglob("*.jpg"))
    assert imgs, "eval must generate from the trainer's exports"
    arr = np.asarray(Image.open(imgs[0]))
    assert arr.shape == (H, W, 3) and arr.std() > 0


def test_train_inversion_adapter_main_async_ckpt(tmp_path, tiny_weights,
                                                 dresscode_root):
    """cli.train_inversion_adapter main() as one process under
    --async_checkpointing: frozen 9ch UNet + trainable adapter,
    checkpoint-2 durable after exit, inversion_adapter_2.pth + sidecar,
    plain-inpaint validation images."""
    from ladi_vton_tpu.cli.train_inversion_adapter import main

    out = tmp_path / "ia_out"
    main(_common(dresscode_root, tiny_weights, out) + [
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--async_checkpointing",
    ])
    assert (out / "checkpoint-2").exists()
    assert (out / "inversion_adapter_2.pth").exists()
    side = json.loads((out / "inversion_adapter_2.config.json").read_text())
    assert side["input_dim"] == 32  # tiny vision hidden, derived
    assert side["output_dim"] == 64 * 16  # tiny text hidden * num_vstar
    val = list((out / "imgs_step_2" / "paired").rglob("*.jpg"))
    assert val, "validation must generate inpaint images"


def test_train_vto_main_tensor_parallel(tmp_path, tiny_weights,
                                        dresscode_root):
    """cli.train_vto main() under --tensor_parallel 2 on the 8-device
    CPU mesh (2D data x model training, parallel/tp.py): steps run,
    checkpoint + export land."""
    from ladi_vton_tpu.cli.train_vto import main

    out = tmp_path / "vto_tp_out"
    main(_common(dresscode_root, tiny_weights, out) + [
        "--clip_vision_dir", str(tiny_weights / "clip_vision"),
        "--tensor_parallel", "2",
    ])
    assert (out / "checkpoint-2").exists()
    assert (out / "unet_2.pth").exists()
