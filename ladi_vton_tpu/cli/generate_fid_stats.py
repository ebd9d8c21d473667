"""Build FID/KID ground-truth statistic caches.

Mirrors reference src/utils/generate_fid_stats.py:9-40 (clean-fid
``make_custom_stats``): precompute Inception pool3 gaussian stats (+ raw
features for KID) for every dataset/category test split, so metric runs
don't re-encode the GT each time.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Generate FID stats caches")
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--stats_root", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ladi_vton_tpu.metrics.compute import (
        MetricModels,
        _gt_image_paths,
        _load_batch_u8,
    )
    from ladi_vton_tpu.metrics.fid import StatsCache, gaussian_stats
    from ladi_vton_tpu.metrics.inception import clean_resize_to_299

    models = MetricModels(args.weights_dir)
    inc_model, inc_vars = models.inception()
    inc_apply = jax.jit(lambda x: inc_model.apply(inc_vars, x))

    jobs = []
    if args.dresscode_dataroot:
        for cat in ("all", "dresses", "upper_body", "lower_body"):
            jobs.append(("dresscode", args.dresscode_dataroot, cat))
    if args.vitonhd_dataroot:
        jobs.append(("vitonhd", args.vitonhd_dataroot, "all"))

    for dataset, root, category in jobs:
        cache = StatsCache(args.stats_root
                           or Path(root).parent / "fid_stats")
        name = f"{dataset}_{category}"
        if cache.exists(name):
            print(f"{name}: exists, skipping")
            continue
        paths = _gt_image_paths(root, dataset, category, "paired")
        keys = sorted(paths)
        feats = []
        for start in range(0, len(keys), args.batch_size):
            chunk = [paths[k] for k in keys[start:start + args.batch_size]]
            u8 = _load_batch_u8(chunk)
            f, _ = inc_apply(jnp.asarray(clean_resize_to_299(u8)))
            feats.append(np.asarray(f))
        feats = np.concatenate(feats)
        mu, sigma = gaussian_stats(feats)
        cache.save(name, mu, sigma, feats)
        print(f"{name}: saved stats for {len(keys)} images")


if __name__ == "__main__":
    main()
