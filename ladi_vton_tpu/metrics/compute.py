"""compute_metrics orchestrator (val_metrics equivalent).

Mirrors the reference's metric entry point
(reference: src/utils/val_metrics.py:105-225): given a folder of
generated images and the dataset GT, computes
ssim / lpips / fid / kid / is with the same conventions — generated and
GT images aligned by file name (ordering assert, val_metrics.py:197),
FID/KID against cached dataset stats (clean-fid custom-stats style,
generate_fid_stats.py:9-40), category-scoped or 'all'.

Weight routing: FID/KID/IS need an Inception checkpoint and LPIPS the
LPIPS-Alex checkpoint, converted on the fly from torch files; pass
``weights_dir`` or set $LADI_VTON_METRIC_WEIGHTS.  SSIM is
weight-free.  Metrics whose weights are unavailable raise with a clear
message rather than silently returning garbage.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _gt_image_paths(gt_root: str, dataset: str, category: str,
                    order: str) -> dict[str, str]:
    """name -> GT person-image path for the test split."""
    paths: dict[str, str] = {}
    if dataset == "dresscode":
        cats = (["dresses", "upper_body", "lower_body"]
                if category == "all" else [category])
        for c in cats:
            pairs = Path(gt_root) / c / f"test_pairs_{order}.txt"
            with open(pairs) as f:
                for line in f:
                    im_name = line.split()[0]
                    paths[im_name] = str(Path(gt_root) / c / "images"
                                         / im_name)
    else:
        with open(Path(gt_root) / "test_pairs.txt") as f:
            for line in f:
                im_name = line.split()[0]
                paths[im_name] = str(Path(gt_root) / "test" / "image"
                                     / im_name)
    return paths


def _gen_image_paths(gen_folder: str, category: str) -> dict[str, str]:
    gen = Path(gen_folder)
    out: dict[str, str] = {}
    roots = ([gen / c for c in
              ("dresses", "upper_body", "lower_body") if (gen / c).exists()]
             if category == "all" else [gen / category])
    if not any(r.exists() for r in roots):
        roots = [gen]
    for root in roots:
        if not root.exists():
            continue
        for p in sorted(root.iterdir()):
            if p.suffix.lower() in (".jpg", ".png", ".jpeg"):
                out[p.stem + ".jpg"] = str(p)
    return out


def _load_batch(paths: List[str], size: tuple[int, int],
                pool=None) -> np.ndarray:
    """Decode+resize a batch; ``pool`` (ThreadPoolExecutor) parallelizes
    the PIL work (decode/resize release the GIL) like the reference's
    DataLoader workers (val_metrics.py --workers)."""
    from PIL import Image

    h, w = size
    out = np.empty((len(paths), h, w, 3), np.float32)

    def load(i_p):
        i, p = i_p
        img = Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR)
        out[i] = np.asarray(img, np.float32) / 255.0

    if pool is not None and len(paths) > 1:
        list(pool.map(load, enumerate(paths)))
    else:
        for ip in enumerate(paths):
            load(ip)
    return out


def _load_batch_u8(paths: List[str], pool=None) -> np.ndarray:
    from PIL import Image

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), np.uint8)

    if pool is not None and len(paths) > 1:
        return np.stack(list(pool.map(load, paths)))
    return np.stack([load(p) for p in paths])


class MetricModels:
    """Lazy weight-gated metric towers."""

    def __init__(self, weights_dir: Optional[str] = None):
        self.weights_dir = Path(
            weights_dir
            or os.environ.get("LADI_VTON_METRIC_WEIGHTS", "weights"))
        self._inception = None
        self._lpips = None

    def inception(self):
        if self._inception is None:
            import jax.numpy as jnp

            from ladi_vton_tpu.hub.convert import load_torch_state
            from ladi_vton_tpu.metrics.inception import (
                InceptionV3,
                convert_inception,
            )

            path = self.weights_dir / "inception.pth"
            if not path.exists():
                raise FileNotFoundError(
                    f"Inception weights not found at {path}. FID/KID/IS "
                    "need the pytorch-fid inception checkpoint; place it "
                    "there or set LADI_VTON_METRIC_WEIGHTS.")
            model = InceptionV3(fid_variant=True)
            variables = convert_inception(load_torch_state(str(path)))
            import jax

            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            self._inception = (model, variables)
        return self._inception

    def lpips(self):
        if self._lpips is None:
            import jax
            import jax.numpy as jnp

            from ladi_vton_tpu.hub.convert import load_torch_state
            from ladi_vton_tpu.metrics.lpips import LPIPS, convert_lpips

            path = self.weights_dir / "lpips_alex.pth"
            if not path.exists():
                raise FileNotFoundError(
                    f"LPIPS-Alex weights not found at {path}; place the "
                    "lpips alexnet checkpoint there or set "
                    "LADI_VTON_METRIC_WEIGHTS.")
            model = LPIPS()
            variables = convert_lpips(load_torch_state(str(path)))
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            self._lpips = (model, variables)
        return self._lpips


def compute_metrics(
    gen_folder: str,
    test_order: str,
    dataset: str,
    category: str,
    metrics2compute: List[str],
    dresscode_dataroot: Optional[str],
    vitonhd_dataroot: Optional[str],
    generated_size: tuple[int, int] = (512, 384),
    batch_size: int = 32,
    workers: int = 8,
    weights_dir: Optional[str] = None,
    stats_root: Optional[str] = None,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from ladi_vton_tpu.metrics.fid import (
        StatsCache,
        frechet_distance,
        gaussian_stats,
        inception_score,
        kid_mmd2,
    )
    from ladi_vton_tpu.metrics.inception import clean_resize_to_299
    from ladi_vton_tpu.metrics.ssim import ssim as ssim_fn

    assert test_order in ("paired", "unpaired")
    assert dataset in ("dresscode", "vitonhd")
    assert category in ("all", "dresses", "lower_body", "upper_body")
    if metrics2compute == ["all"]:
        metrics2compute = ["ssim_score", "lpips_score", "fid_score",
                           "kid_score", "is_score"]
    for m in metrics2compute:
        assert m in ("ssim_score", "lpips_score", "fid_score", "kid_score",
                     "is_score"), f"Unsupported metric {m}"

    gt_root = dresscode_dataroot if dataset == "dresscode" else vitonhd_dataroot
    gen_paths = _gen_image_paths(gen_folder, category)
    gt_paths = _gt_image_paths(gt_root, dataset, category, test_order)
    names = sorted(gen_paths)
    missing = [n for n in names if n not in gt_paths]
    assert not missing, f"generated images without GT: {missing[:5]}"

    models = MetricModels(weights_dir)
    need_inception = {"fid_score", "kid_score", "is_score"} & set(
        metrics2compute)
    need_lpips = "lpips_score" in metrics2compute

    results: Dict[str, float] = {}
    ssim_vals: list[float] = []
    lpips_vals: list[float] = []
    gen_feats: list[np.ndarray] = []
    gen_logits: list[np.ndarray] = []

    if need_inception:
        inc_model, inc_vars = models.inception()
        inc_apply = jax.jit(lambda x: inc_model.apply(inc_vars, x))
    if need_lpips:
        lp_model, lp_vars = models.lpips()
        lp_apply = jax.jit(
            lambda a, b: lp_model.apply(lp_vars, a, b, normalize=True))
    ssim_apply = jax.jit(ssim_fn)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(workers) if workers > 1 else None
    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        gen_batch = _load_batch([gen_paths[n] for n in chunk],
                                generated_size, pool)
        if "ssim_score" in metrics2compute or need_lpips:
            gt_batch = _load_batch([gt_paths[n] for n in chunk],
                                   generated_size, pool)
        if "ssim_score" in metrics2compute:
            ssim_vals.append(float(ssim_apply(jnp.asarray(gen_batch),
                                              jnp.asarray(gt_batch))))
        if need_lpips:
            lpips_vals.append(float(lp_apply(jnp.asarray(gen_batch),
                                             jnp.asarray(gt_batch))))
        if need_inception:
            u8 = (gen_batch * 255).round().astype(np.uint8)
            inc_in = clean_resize_to_299(u8)
            feats, logits = inc_apply(jnp.asarray(inc_in))
            gen_feats.append(np.asarray(feats))
            gen_logits.append(np.asarray(logits))

    if "ssim_score" in metrics2compute:
        results["ssim_score"] = float(np.mean(ssim_vals))
    if need_lpips:
        results["lpips_score"] = float(np.mean(lpips_vals))

    if need_inception:
        gen_feats_all = np.concatenate(gen_feats)
        stats_name = f"{dataset}_{category}"
        cache = StatsCache(stats_root or Path(gt_root).parent / "fid_stats")
        if ({"fid_score", "kid_score"} & set(metrics2compute)
                and not cache.exists(stats_name)):
            # build GT stats (clean-fid make_custom_stats equivalent)
            gt_names = sorted(gt_paths)
            feats = []
            for start in range(0, len(gt_names), batch_size):
                chunk = [gt_paths[n] for n in
                         gt_names[start:start + batch_size]]
                # clean-fid builds stats from the raw GT images (uniform
                # native resolution per dataset)
                u8 = _load_batch_u8(chunk, pool)
                f, _ = inc_apply(jnp.asarray(clean_resize_to_299(u8)))
                feats.append(np.asarray(f))
            feats = np.concatenate(feats)
            mu, sigma = gaussian_stats(feats)
            cache.save(stats_name, mu, sigma, feats)
        if "fid_score" in metrics2compute:
            mu_gt, sigma_gt, _ = cache.load(stats_name)
            mu_g, sigma_g = gaussian_stats(gen_feats_all)
            results["fid_score"] = frechet_distance(mu_g, sigma_g, mu_gt,
                                                    sigma_gt)
        if "kid_score" in metrics2compute:
            _, _, gt_feats = cache.load(stats_name)
            if gt_feats is None:
                raise ValueError(
                    "stats cache has no raw features; rebuild it to "
                    "compute KID")
            results["kid_score"] = kid_mmd2(gen_feats_all, gt_feats) * 1000
        if "is_score" in metrics2compute:
            is_mean, _ = inception_score(np.concatenate(gen_logits))
            results["is_score"] = is_mean

    if pool is not None:
        pool.shutdown()
    return results


def fid_between_folders(folder_a: str, folder_b: str, *,
                        batch_size: int = 32,
                        weights_dir: Optional[str] = None) -> float:
    """FID between two plain image folders — the clean-fid
    ``compute_fid(a, b, mode='clean')`` surface, used by the metric
    parity harness (tests/test_metric_parity.py)."""
    import jax
    import jax.numpy as jnp

    from ladi_vton_tpu.metrics.fid import frechet_distance, gaussian_stats
    from ladi_vton_tpu.metrics.inception import clean_resize_to_299

    inc_model, inc_vars = MetricModels(weights_dir).inception()
    inc_apply = jax.jit(lambda x: inc_model.apply(inc_vars, x))

    def folder_stats(folder):
        paths = sorted(
            p for p in Path(folder).iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
        feats = []
        for start in range(0, len(paths), batch_size):
            u8 = _load_batch_u8(
                [str(p) for p in paths[start:start + batch_size]])
            f, _ = inc_apply(jnp.asarray(clean_resize_to_299(u8)))
            feats.append(np.asarray(f))
        return gaussian_stats(np.concatenate(feats))

    mu_a, s_a = folder_stats(folder_a)
    mu_b, s_b = folder_stats(folder_b)
    return frechet_distance(mu_a, s_a, mu_b, s_b)
