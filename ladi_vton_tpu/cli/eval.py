"""Evaluation CLI: try-on generation with locally trained checkpoints.

Flag surface mirrors reference src/eval.py:33-129 (unet/emasc/adapter
checkpoint dirs + names, emasc_type incl. 'none', text_usage,
cloth_input_type, batch/category/order/metrics flags).  Flow is the
reference's eval loop (src/eval.py:281-364) expressed through
``pipelines.drivers.generate_images_from_tryon_pipe``: precomputed
warped cloths come from the dataset cache (stage-1 extraction), EMASC
and the adapter are optional, metrics are computed at the end when
``--compute_metrics``.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Eval with local checkpoints")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_name", type=str, required=True)
    p.add_argument("--test_order", type=str, required=True,
                   choices=["unpaired", "paired"])
    p.add_argument("--unet_dir", required=True, type=str)
    p.add_argument("--unet_name", type=str, default="latest")
    p.add_argument("--inversion_adapter_dir", type=str, default=None)
    p.add_argument("--inversion_adapter_name", type=str, default="latest")
    p.add_argument("--emasc_dir", type=str, default=None)
    p.add_argument("--emasc_name", type=str, default="latest")
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="stabilityai/stable-diffusion-2-inpainting")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--batch_size", type=int, default=8)
    # accepted no-op on TPU like the other GPU knobs (reference
    # src/eval.py argparse; TF32 is an Ampere matmul mode)
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--category", type=str, default="all",
                   choices=["all", "lower_body", "upper_body", "dresses"])
    p.add_argument("--emasc_type", type=str, default="nonlinear",
                   choices=["none", "linear", "nonlinear"])
    p.add_argument("--emasc_kernel", type=int, default=3)
    p.add_argument("--emasc_padding", type=int, default=1)
    p.add_argument("--text_usage", type=str, default="inversion_adapter",
                   choices=["none", "noun_chunks", "inversion_adapter"])
    p.add_argument("--cloth_input_type", type=str,
                   choices=["warped", "none"], default="warped")
    p.add_argument("--num_vstar", default=16, type=int)
    p.add_argument("--num_encoder_layers", default=1, type=int)
    p.add_argument("--use_png", default=False, action="store_true")
    p.add_argument("--num_inference_steps", default=50, type=int)
    p.add_argument("--scheduler", type=str, default="ddim",
                   choices=["ddim", "pndm", "lms", "dpm"],
                   help="Sampler. 'dpm' (DPM-Solver++ 2M) reaches "
                        "DDIM-50 quality at ~20 steps (pair with "
                        "--num_inference_steps 20).")
    p.add_argument("--guidance_scale", default=7.5, type=float)
    p.add_argument("--use_clip_cloth_features", action="store_true")
    p.add_argument("--compute_metrics", default=False, action="store_true")
    # offline weight routing
    p.add_argument("--sd2_model_dir", type=str, required=False)
    p.add_argument("--clip_vision_dir", type=str, required=False)
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--caption_file", type=str, default=None)
    p.add_argument("--height", type=int, default=512,
                   help="Generation height (the reference fixes 512)")
    p.add_argument("--width", type=int, default=384,
                   help="Generation width (reference fixes 384)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Shard the UNet matmuls over a 'model' mesh axis "
                        "of this size (parallel/tp.py); devices split "
                        "data x model.  Beyond-reference option.")
    return p.parse_args(argv)


def _latest_pth(directory: str, prefix: str, name: str) -> str:
    """Resolve 'latest' to the highest-step ``{prefix}_{step}.pth``
    (reference src/eval.py checkpoint-name resolution)."""
    if name != "latest":
        return str(Path(directory) / name)
    candidates = sorted(
        Path(directory).glob(f"{prefix}_*.pth"),
        key=lambda p: int(p.stem.split("_")[-1])
        if p.stem.split("_")[-1].isdigit() else -1)
    if not candidates:
        raise FileNotFoundError(
            f"no {prefix}_*.pth under {directory}")
    return str(candidates[-1])


def main(argv=None):
    args = parse_args(argv)
    if args.dataset == "vitonhd" and args.vitonhd_dataroot is None:
        raise ValueError("VitonHD dataroot must be provided")
    if args.dataset == "dresscode" and args.dresscode_dataroot is None:
        raise ValueError("DressCode dataroot must be provided")

    import jax.numpy as jnp

    from ladi_vton_tpu.cli.train_vto import build_dataset
    from ladi_vton_tpu.core.dtypes import default_policy
    from ladi_vton_tpu.data.loader import BatchLoader
    from ladi_vton_tpu.diffusion.schedulers import make_scheduler
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.pipelines.drivers import (
        generate_images_from_tryon_pipe,
    )
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline
    from ladi_vton_tpu.utils.tokenizer import CLIPTokenizer

    dtype = default_policy(args.mixed_precision).compute_dtype

    unet, unet_vars = zoo.extended_unet(
        args.dataset,
        checkpoint=_latest_pth(args.unet_dir, "unet", args.unet_name),
        dtype=dtype)
    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)
    text_model, text_vars = zoo.sd2_text_encoder(args.sd2_model_dir,
                                                 dtype=dtype)
    tokenizer = CLIPTokenizer.from_dir(
        args.tokenizer_dir or str(Path(args.sd2_model_dir) / "tokenizer"))

    emasc = emasc_vars = None
    if args.emasc_type != "none" and args.emasc_dir:
        if args.emasc_padding != args.emasc_kernel // 2:
            raise ValueError(
                "this port derives EMASC padding as kernel//2 (shape-"
                f"preserving); got kernel={args.emasc_kernel} "
                f"padding={args.emasc_padding}")
        emasc, emasc_vars = zoo.emasc(
            args.dataset,
            checkpoint=_latest_pth(args.emasc_dir, "emasc",
                                   args.emasc_name),
            dtype=dtype, kind=args.emasc_type,
            kernel_size=args.emasc_kernel)

    adapter = adapter_vars = vision = vision_vars = None
    if args.text_usage == "inversion_adapter":
        adapter, adapter_vars = zoo.inversion_adapter(
            args.dataset,
            checkpoint=_latest_pth(args.inversion_adapter_dir,
                                   "inversion_adapter",
                                   args.inversion_adapter_name),
            dtype=dtype, num_encoder_layers=args.num_encoder_layers,
            num_vstar=args.num_vstar)
        if not args.use_clip_cloth_features:
            vision, vision_vars = zoo.clip_vit_h_vision(
                args.clip_vision_dir, dtype=dtype)

    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=make_scheduler(args.scheduler))
    params = {"unet": unet_vars, "vae": vae_vars}
    if emasc is not None:
        params["emasc"] = emasc_vars

    outputlist = ["image", "pose_map", "inpaint_mask", "im_mask",
                  "category", "im_name", "cloth"]
    if args.cloth_input_type == "warped":
        outputlist.append("warped_cloth")
    if args.text_usage == "noun_chunks":
        outputlist.append("captions")
    if args.use_clip_cloth_features:
        outputlist.append("clip_cloth_features")

    if args.dataset == "dresscode":
        from ladi_vton_tpu.data import DressCodeDataset

        cats = (("dresses", "upper_body", "lower_body")
                if args.category == "all" else (args.category,))
        dataset = DressCodeDataset(
            args.dresscode_dataroot, phase="test", order=args.test_order,
            outputlist=tuple(outputlist), category=cats,
            caption_file=args.caption_file,
            size=(args.height, args.width))
    else:
        dataset = build_dataset(args, "test", args.test_order,
                                tuple(outputlist),
                                size=(args.height, args.width))
    # batch generation is data-parallel over the device mesh (the
    # reference's accelerator.prepare DDP eval, src/eval.py:317): the
    # batch size rounds up to a multiple of the data-axis size and
    # pad_last keeps every batch full.
    from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(model=args.tensor_parallel))
    # per-shard flash attention under TP, scoped to this main and reset
    # on the way out (advisor r4; parallel/tp.py tp_attention_scope)
    from ladi_vton_tpu.parallel import tp_attention_scope

    tp_scope = tp_attention_scope(mesh, args.tensor_parallel)
    n_data = mesh.shape["data"]
    batch_size = -(-args.batch_size // n_data) * n_data
    loader = BatchLoader(dataset, batch_size,
                         num_workers=args.num_workers, pad_last=True)

    save_dir = os.path.join(args.output_dir, args.save_name,
                            args.test_order)
    generate_images_from_tryon_pipe(
        pipe, params, text_model, text_vars, tokenizer, loader, save_dir,
        inversion_adapter=adapter, adapter_vars=adapter_vars,
        vision=vision, vision_vars=vision_vars,
        text_usage=args.text_usage, num_vstar=args.num_vstar,
        seed=args.seed, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, use_png=args.use_png,
        cloth_input_type=args.cloth_input_type, mesh=mesh)

    if args.compute_metrics:
        from ladi_vton_tpu.metrics.compute import compute_metrics

        metrics = compute_metrics(
            save_dir, args.test_order, args.dataset, args.category,
            ["all"], args.dresscode_dataroot, args.vitonhd_dataroot)
        with open(os.path.join(
                save_dir,
                f"metrics_{args.test_order}_{args.category}.json"),
                "w+") as f:
            json.dump(metrics, f, indent=4)
    tp_scope.close()


if __name__ == "__main__":
    main()
