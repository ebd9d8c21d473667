"""Standalone metric CLI.

Mirrors reference src/utils/val_metrics.py:228-264: compute
FID/KID/IS/SSIM/LPIPS for a folder of generated images against the
dataset ground truth, dump a JSON.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Compute the metrics for the generated images")
    p.add_argument("--gen_folder", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--test_order", type=str, required=True,
                   choices=["unpaired", "paired"])
    p.add_argument("--category", type=str, default="all",
                   choices=["all", "dresses", "lower_body", "upper_body"])
    p.add_argument("--metrics", type=str, nargs="+", default=["all"],
                   choices=["all", "ssim_score", "lpips_score",
                            "fid_score", "kid_score", "is_score"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--weights_dir", type=str, default=None,
                   help="dir with inception.pth / lpips_alex.pth")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ladi_vton_tpu.metrics.compute import compute_metrics

    metrics = compute_metrics(
        args.gen_folder, args.test_order, args.dataset, args.category,
        args.metrics, args.dresscode_dataroot, args.vitonhd_dataroot,
        generated_size=(args.height, args.width),
        batch_size=args.batch_size, workers=args.workers,
        weights_dir=args.weights_dir)
    print(json.dumps(metrics, indent=2))
    out = os.path.join(args.gen_folder,
                       f"metrics_{args.test_order}_{args.category}.json")
    with open(out, "w+") as f:
        json.dump(metrics, f, indent=4)


if __name__ == "__main__":
    main()
