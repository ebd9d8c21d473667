"""Full-resolution DressCode-layout fixture for full-scale CLI drives.

3 categories x 8 items at 512x384, with train + test_pairs files.
"""
import json
from pathlib import Path

import numpy as np
from PIL import Image

root = Path("/tmp/fixture/dresscode")


def keypoints():
    rng = np.random.default_rng(0)
    pts = rng.uniform([100, 100], [300, 400], size=(18, 2))
    return np.concatenate([pts, np.ones((18, 2))], axis=1)


for cat in ("upper_body", "lower_body", "dresses"):
    croot = root / cat
    for sub in ("images", "masks", "label_maps", "keypoints",
                "skeletons", "dense"):
        (croot / sub).mkdir(parents=True, exist_ok=True)
    pairs = []
    for i in range(8):
        im, c = f"{i:06d}_0.jpg", f"{i:06d}_1.jpg"
        pairs.append(f"{im} {c}")
        g = np.random.default_rng(hash(cat) % 1000 + i)
        Image.fromarray(g.integers(0, 255, (512, 384, 3),
                                   dtype=np.uint8)).save(
            croot / "images" / im)
        Image.fromarray(g.integers(0, 255, (512, 384, 3),
                                   dtype=np.uint8)).save(
            croot / "images" / c)
        Image.fromarray((g.uniform(size=(512, 384)) > 0.5).astype(
            np.uint8) * 255).save(
            croot / "masks" / c.replace(".jpg", ".png"))
        Image.fromarray(g.integers(0, 18, (512, 384), dtype=np.uint8),
                        mode="L").save(
            croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
        with open(croot / "keypoints" / im.replace("_0.jpg", "_2.json"),
                  "w") as f:
            json.dump({"keypoints": keypoints().tolist()}, f)
    for fname, plist in (("train_pairs.txt", pairs),
                         ("test_pairs_paired.txt", pairs),
                         ("test_pairs_unpaired.txt", pairs)):
        with open(croot / fname, "w") as f:
            f.write("\n".join(plist) + "\n")
print("fixture at", root)
