"""Offline CLIP cloth-feature pre-extraction CLI.

Mirrors reference src/utils/compute_cloth_clip_features.py:143-166:
resize each in-shop garment to 224x224, CLIP-process, run the ViT-H/14
vision tower, and cache every last_hidden_state keyed by cloth name.
Cache format is the framework's ``.npz`` (``data.features``), readable
alongside the reference's ``.pt``+``.pkl``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Precompute CLIP cloth features")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--phase", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--clip_vision_dir", type=str, required=True)
    p.add_argument("--cache_root", type=str, default=None)
    # reference flag (src/utils/compute_cloth_clip_features.py argparse);
    # accepted for parity — the vision tower loads from
    # --clip_vision_dir in this offline-weight framework
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="laion/CLIP-ViT-H-14-laion2B-s32B-b79K")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ladi_vton_tpu.data import (
        BatchLoader,
        DressCodeDataset,
        VitonHDDataset,
    )
    from ladi_vton_tpu.data.features import ClothFeatureCache
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.ops.resize import resize_bilinear

    if args.dataset == "dresscode":
        dataroot = args.dresscode_dataroot
        dataset = DressCodeDataset(dataroot, phase=args.phase,
                                   order="paired",
                                   outputlist=("cloth", "c_name"))
    else:
        dataroot = args.vitonhd_dataroot
        dataset = VitonHDDataset(dataroot, phase=args.phase,
                                 order="paired",
                                 outputlist=("cloth", "c_name"))

    vision, vision_vars = zoo.clip_vit_h_vision(args.clip_vision_dir)
    clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    @jax.jit
    def run(vv, cloth):
        x = jnp.clip(resize_bilinear((cloth + 1.0) * 0.5, (224, 224)),
                     0, 1)
        x = (x - clip_mean) / clip_std
        return vision.apply(vv, x)

    loader = BatchLoader(dataset, args.batch_size,
                         num_workers=args.num_workers, pad_last=True)
    names: list[str] = []
    feats: list[np.ndarray] = []
    seen: set[str] = set()
    for batch in loader:
        out = np.asarray(run(vision_vars, jnp.asarray(batch["cloth"])))
        for name, feat in zip(batch["c_name"], out):
            if name in seen:
                continue
            seen.add(name)
            names.append(name)
            feats.append(feat.astype(np.float16))

    cache_root = Path(args.cache_root or Path(dataroot).parent / "cache")
    target = cache_root / "clip_cloth_embeddings" / args.dataset
    ClothFeatureCache.write(target, args.phase, names,
                            np.stack(feats).astype(np.float32))
    print(f"wrote {len(names)} features to {target}")


if __name__ == "__main__":
    main()
