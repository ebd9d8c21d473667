"""Data-layer tests on a synthesized DressCode/VITON-HD folder layout.

SURVEY.md §4: a fake dataset fixture makes the dataset code testable
without the real 20GB datasets.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ladi_vton_tpu.data.dresscode import DressCodeDataset
from ladi_vton_tpu.data.vitonhd import VitonHDDataset
from ladi_vton_tpu.data.loader import BatchLoader, collate
from ladi_vton_tpu.data.raster import (
    draw_polyline,
    draw_rectangle,
    keypoint_heatmap,
)

H, W = 64, 48


def _keypoints_384x512(n=18):
    rng = np.random.default_rng(0)
    pts = rng.uniform([100, 100], [300, 400], size=(n, 2))
    return np.concatenate([pts, np.ones((n, 2))], axis=1)


@pytest.fixture(scope="module")
def dresscode_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dresscode")
    for cat in ("upper_body", "lower_body", "dresses"):
        croot = root / cat
        for sub in ("images", "masks", "label_maps", "keypoints",
                    "skeletons", "dense"):
            (croot / sub).mkdir(parents=True)
        pairs = []
        for i in range(2):
            im = f"{i:06d}_0.jpg"
            c = f"{i:06d}_1.jpg"
            pairs.append(f"{im} {c}")
            rng = np.random.default_rng(i)
            Image.fromarray(
                rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
            ).save(croot / "images" / im)
            Image.fromarray(
                rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
            ).save(croot / "images" / c)
            Image.fromarray(
                (rng.uniform(size=(64, 48)) > 0.5).astype(np.uint8) * 255
            ).save(croot / "masks" / c.replace(".jpg", ".png"))
            parse = rng.integers(0, 18, (64, 48), dtype=np.uint8)
            Image.fromarray(parse, mode="L").save(
                croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
            with open(croot / "keypoints"
                      / im.replace("_0.jpg", "_2.json"), "w") as f:
                json.dump({"keypoints": _keypoints_384x512().tolist()}, f)
        with open(croot / "train_pairs.txt", "w") as f:
            f.write("\n".join(pairs) + "\n")
        with open(croot / "test_pairs_paired.txt", "w") as f:
            f.write("\n".join(pairs) + "\n")
    return root


@pytest.fixture(scope="module")
def vitonhd_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vitonhd")
    phase_root = root / "train"
    for sub in ("cloth", "image", "image-parse-v3", "openpose_json",
                "openpose_img"):
        (phase_root / sub).mkdir(parents=True)
    pairs = []
    for i in range(2):
        im = f"{i:05d}_00.jpg"
        pairs.append(f"{im} {im}")
        rng = np.random.default_rng(i)
        Image.fromarray(
            rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
        ).save(phase_root / "image" / im)
        Image.fromarray(
            rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
        ).save(phase_root / "cloth" / im)
        parse = rng.integers(0, 20, (64, 48), dtype=np.uint8)
        Image.fromarray(parse, mode="L").save(
            phase_root / "image-parse-v3" / im.replace(".jpg", ".png"))
        body25 = np.zeros((25, 3))
        body25[:, 0] = np.linspace(100, 600, 25)
        body25[:, 1] = np.linspace(100, 900, 25)
        body25[:, 2] = 1.0
        with open(phase_root / "openpose_json"
                  / im.replace(".jpg", "_keypoints.json"), "w") as f:
            json.dump(
                {"people": [{"pose_keypoints_2d":
                             body25.reshape(-1).tolist()}]}, f)
    with open(root / "train_pairs.txt", "w") as f:
        f.write("\n".join(pairs) + "\n")
    return root


OUTPUTLIST = ("c_name", "im_name", "cloth", "image", "pose_map",
              "inpaint_mask", "im_mask", "parse_array", "shape",
              "category", "im_pose", "parse_mask_total")


def test_dresscode_item_contract(dresscode_root):
    ds = DressCodeDataset(str(dresscode_root), phase="train",
                          outputlist=OUTPUTLIST, size=(H, W))
    assert len(ds) == 6  # 2 pairs x 3 categories
    item = ds[0]
    assert set(item) == set(OUTPUTLIST)
    assert item["image"].shape == (H, W, 3)
    assert item["cloth"].shape == (H, W, 3)
    assert item["pose_map"].shape == (H, W, 18)
    assert item["inpaint_mask"].shape == (H, W, 1)
    assert item["im_mask"].shape == (H, W, 3)
    assert item["shape"].shape == (H, W, 1)
    assert item["category"] in ("dresses", "upper_body", "lower_body")
    # mask is binary and complementary to keep
    m = item["inpaint_mask"]
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # image values in [-1, 1]
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0


def test_dresscode_rejects_unknown_keys(dresscode_root):
    with pytest.raises(ValueError):
        DressCodeDataset(str(dresscode_root), phase="train",
                         outputlist=("image", "bogus"), size=(H, W))


def test_vitonhd_item_contract(vitonhd_root):
    ds = VitonHDDataset(str(vitonhd_root), phase="train",
                        outputlist=OUTPUTLIST, size=(H, W))
    assert len(ds) == 2
    item = ds[0]
    assert set(item) == set(OUTPUTLIST)
    assert item["pose_map"].shape == (H, W, 18)
    assert item["category"] == "upper_body"


def test_batch_loader_shapes(dresscode_root):
    ds = DressCodeDataset(str(dresscode_root), phase="train",
                          outputlist=("image", "im_name", "pose_map"),
                          size=(H, W))
    loader = BatchLoader(ds, batch_size=4, num_workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, H, W, 3)
    assert isinstance(batches[0]["im_name"], list)
    # last partial batch not dropped by default
    assert batches[1]["image"].shape[0] == 2


def test_batch_loader_pad_last(dresscode_root):
    ds = DressCodeDataset(str(dresscode_root), phase="train",
                          outputlist=("image",), size=(H, W))
    loader = BatchLoader(ds, batch_size=4, pad_last=True)
    shapes = [b["image"].shape[0] for b in loader]
    assert shapes == [4, 4]

    # remainder smaller than HALF the batch: padding must loop (a 6-item
    # dataset at batch 16 -> one full static batch, not 12)
    loader = BatchLoader(ds, batch_size=16, pad_last=True)
    shapes = [b["image"].shape[0] for b in loader]
    assert shapes == [16]


def test_rasterizers_match_pil():
    from PIL import ImageDraw

    # rectangle parity
    ours = draw_rectangle(32, 32, 5, 6, 15, 20)
    img = Image.new("L", (32, 32))
    ImageDraw.Draw(img).rectangle((5, 6, 15, 20), "white", "white")
    np.testing.assert_array_equal(ours, np.asarray(img) / 255.0)

    # heatmap: max 1 at keypoint, zero for missing keypoint
    hm = keypoint_heatmap(np.array([10.0, 12.0]), (32, 32), 9.0)
    assert abs(hm[12, 10] - 1.0) < 1e-5
    assert keypoint_heatmap(np.array([0.0, 0.0]), (32, 32), 9.0).max() == 0

    # thick line covers its endpoints' disks approximately like PIL
    pts = np.array([[5, 5], [25, 25]], np.float32)
    ours = draw_polyline(32, 32, pts, 9)
    img = Image.new("L", (32, 32))
    ImageDraw.Draw(img).line([(5, 5), (25, 25)], "white", 9, "curve")
    theirs = np.asarray(img) / 255.0
    iou = (ours * theirs).sum() / max(((ours + theirs) > 0).sum(), 1)
    assert iou > 0.8


def test_native_library_matches_numpy_oracles():
    from ladi_vton_tpu.data import native
    from ladi_vton_tpu.data.raster import (
        draw_polyline as np_polyline,
        pose_heatmaps as np_heatmaps,
    )

    if not native.build():
        import pytest

        pytest.skip("native toolchain unavailable")
    assert native.native_available()

    rng = np.random.default_rng(0)
    kps = np.concatenate(
        [rng.uniform(2, 30, (6, 2)).astype(np.float32),
         np.array([[0.0, 0.0]], np.float32)]).astype(np.float32)
    ours = native.pose_heatmaps(kps, (32, 24), 9.0)
    ref = np_heatmaps(kps, (32, 24), 9.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    pts = np.array([[3, 4], [20, 18], [28, 6]], np.float32)
    ours = native.draw_polyline(32, 24, pts, 7.0)
    ref = np_polyline(32, 24, pts, 7.0)
    np.testing.assert_array_equal(ours, ref)

    import cv2

    m = (rng.uniform(size=(40, 30)) > 0.92).astype(np.float32)
    ours = native.box_dilate(m, 5, 5)
    ref = cv2.dilate(m, np.ones((5, 5), np.uint16), iterations=5)
    np.testing.assert_array_equal(ours, ref)

    img = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
    ours = native.resize_bilinear_u8(img, (32, 24))
    ref = cv2.resize(img, (24, 32), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_batch_loader_process_mode_matches_thread_mode(dresscode_root):
    """workers_mode='process' (torch-DataLoader-style fork pool,
    reference src/train_vto.py:400-432 num_workers) yields byte-equal
    batches in the same order as the thread pool."""
    ds = DressCodeDataset(str(dresscode_root), phase="train",
                          outputlist=("image", "im_name", "pose_map"),
                          size=(H, W))
    thread = list(BatchLoader(ds, batch_size=3, num_workers=2))
    proc = list(BatchLoader(ds, batch_size=3, num_workers=2,
                            workers_mode="process"))
    assert len(thread) == len(proc)
    for a, b in zip(thread, proc):
        assert a["im_name"] == b["im_name"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["pose_map"], b["pose_map"])
