"""Input-pipeline throughput: thread pool vs process pool.

Builds a synthetic DressCode-layout dataset (the tests' fixture
recipe) at full 512x384 resolution and measures items/sec through
``BatchLoader`` in both worker modes, against the TPU step time the
pipeline must hide (~0.6 s/batch-8 at 512x384 DDIM-50 per image =
4.8 s; training steps ~1 s).

Run: python -m tools.bench_loader [--items 48] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image


def make_fixture(root: Path, items: int):
    rng = np.random.default_rng(0)
    kpts = np.concatenate([
        rng.uniform([100, 100], [300, 400], size=(18, 2)),
        np.ones((18, 2))], axis=1)
    cat = "upper_body"
    croot = root / cat
    for sub in ("images", "masks", "label_maps", "keypoints"):
        (croot / sub).mkdir(parents=True)
    pairs = []
    for i in range(items):
        im, c = f"{i:06d}_0.jpg", f"{i:06d}_1.jpg"
        pairs.append(f"{im} {c}")
        g = np.random.default_rng(i)
        for name in (im, c):
            Image.fromarray(g.integers(0, 255, (512, 384, 3),
                                       dtype=np.uint8)).save(
                croot / "images" / name)
        Image.fromarray((g.uniform(size=(512, 384)) > 0.5).astype(
            np.uint8) * 255).save(
            croot / "masks" / c.replace(".jpg", ".png"))
        Image.fromarray(g.integers(0, 18, (512, 384), dtype=np.uint8),
                        mode="L").save(
            croot / "label_maps" / im.replace("_0.jpg", "_4.png"))
        with open(croot / "keypoints" / im.replace("_0.jpg", "_2.json"),
                  "w") as f:
            json.dump({"keypoints": kpts.tolist()}, f)
    with open(croot / "train_pairs.txt", "w") as f:
        f.write("\n".join(pairs) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=48)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    # must OVERWRITE: the axon environment exports JAX_PLATFORMS=axon
    # globally, so setdefault would still pick the TPU backend; and the
    # axon jax-import hook force-sets jax_platforms="axon,cpu", so the
    # config must be re-pinned too or backend init blocks on the relay.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ladi_vton_tpu.data import DressCodeDataset
    from ladi_vton_tpu.data.loader import BatchLoader

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "dresscode"
        make_fixture(root, args.items)
        ds = DressCodeDataset(
            str(root), phase="train", category=("upper_body",),
            outputlist=("image", "im_mask", "inpaint_mask", "pose_map",
                        "cloth", "im_name", "category"),
            size=(512, 384))
        # step-time headroom targets the loader must beat to never
        # starve the chip (measured on v5e — docs/PERF.md §8/§9):
        # inference batch-8 ~4.2 s/batch -> 1.9 items/s; train default
        # batch-16 ~1 s/step -> 16 items/s (reference default
        # train_batch_size=16, cli/train_emasc.py).
        targets = {8: ("inference b8", 1.9), 16: ("train b16", 16.0)}
        for batch_size in sorted({args.batch_size, 16}):
            what, need = targets.get(batch_size, (f"b{batch_size}", None))
            for mode in ("thread", "process"):
                loader = BatchLoader(ds, batch_size,
                                     num_workers=args.workers,
                                     workers_mode=mode)
                # warm one epoch (page cache), then measure
                for _ in loader:
                    pass
                t0 = time.perf_counter()
                n = 0
                for batch in loader:
                    n += len(batch["im_name"])
                dt = time.perf_counter() - t0
                rate = n / dt
                verdict = ""
                if need is not None:
                    verdict = (f"  [{what} needs {need} items/s: "
                               f"{'OK' if rate >= need else 'STARVED'}]")
                print(f"{mode:8s} b={batch_size:<3d} "
                      f"workers={args.workers}: {rate:7.2f} items/s  "
                      f"({dt:.2f}s for {n}){verdict}", flush=True)
                loader.close()


if __name__ == "__main__":
    main()
