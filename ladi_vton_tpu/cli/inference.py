"""End-to-end try-on inference CLI (hub-weights path).

Mirrors the reference's ``src/inference.py`` flag surface and flow
(reference: src/inference.py:31-96 flags, :229-324 loop, README.md
"Inference with pre-trained models"): per batch — TPS warp at 256x192,
grid upsample + border grid-sample at 512x384, refinement UNet, CLIP
ViT-H vision features, inversion adapter -> 16 PTEs, PTE-injected text
encode, 50-step DDIM try-on pipeline, per-category image save, optional
metric computation.

TPU-native differences: the whole per-batch compute (warp -> refine ->
condition -> denoise -> decode) is ONE jitted function with static
shapes (the last batch is padded, reference drops nothing because its
batches are dynamic); weights load from local checkpoint dirs via
``hub.zoo`` instead of torch.hub downloads.

Extra flags over the reference (all optional, for offline weight
routing): --checkpoint_dir, --sd2_model_dir, --clip_vision_dir,
--tokenizer_dir.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Full inference script")
    parser.add_argument("--pretrained_model_name_or_path", type=str,
                        default="stabilityai/stable-diffusion-2-inpainting",
                        help="Kept for flag parity; weights load from "
                             "--sd2_model_dir.")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--allow_tf32", action="store_true",
                        help="No-op on TPU (bf16 MXU is the default).")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--mixed_precision", type=str, default=None,
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("--enable_xformers_memory_efficient_attention",
                        action="store_true",
                        help="No-op: Pallas flash attention is default-on.")
    parser.add_argument("--dresscode_dataroot", type=str)
    parser.add_argument("--vitonhd_dataroot", type=str)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--num_vstar", default=16, type=int)
    parser.add_argument("--test_order", type=str, required=True,
                        choices=["unpaired", "paired"])
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["dresscode", "vitonhd"])
    parser.add_argument("--category", type=str, default="all",
                        choices=["all", "lower_body", "upper_body",
                                 "dresses"])
    parser.add_argument("--use_png", default=False, action="store_true")
    parser.add_argument("--num_inference_steps", default=50, type=int)
    parser.add_argument("--scheduler", type=str, default="ddim",
                        choices=["ddim", "pndm", "lms", "dpm"],
                        help="Sampler. 'dpm' (DPM-Solver++ 2M) reaches "
                             "DDIM-50 quality at ~20 steps — pair with "
                             "--num_inference_steps 20 for ~2.4x "
                             "throughput (beyond-reference option).")
    parser.add_argument("--guidance_scale", default=7.5, type=float)
    parser.add_argument("--compute_metrics", default=False,
                        action="store_true")
    # offline weight routing (this framework has no hub downloads by default)
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Directory with {unet,emasc,inversion_adapter,"
                             "warping}_<dataset>.pth")
    parser.add_argument("--sd2_model_dir", type=str, required=False,
                        help="Local SD-2-inpainting model directory "
                             "(vae/, text_encoder/, tokenizer/)")
    parser.add_argument("--clip_vision_dir", type=str, required=False,
                        help="Local CLIP-ViT-H-14 model directory")
    parser.add_argument("--tokenizer_dir", type=str, default=None,
                        help="Directory with vocab.json + merges.txt "
                             "(defaults to <sd2_model_dir>/tokenizer)")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="Shard the UNet's attention/FF matmuls over "
                             "a 'model' mesh axis of this size (Megatron "
                             "column/row plan, parallel/tp.py); devices "
                             "split data x model.  Beyond-reference "
                             "latency/memory option — DP alone is "
                             "throughput-optimal (docs/PERF.md).")
    parser.add_argument("--height", type=int, default=512,
                        help="Generation height (the reference fixes "
                             "512; must be divisible by 64)")
    parser.add_argument("--width", type=int, default=384,
                        help="Generation width (reference fixes 384)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.dataset == "vitonhd" and args.vitonhd_dataroot is None:
        raise ValueError("VitonHD dataroot must be provided")
    if args.dataset == "dresscode" and args.dresscode_dataroot is None:
        raise ValueError("DressCode dataroot must be provided")

    import jax
    import jax.numpy as jnp

    from ladi_vton_tpu.core.dtypes import default_policy
    from ladi_vton_tpu.core.rng import set_seed
    from ladi_vton_tpu.data import BatchLoader, DressCodeDataset, VitonHDDataset
    from ladi_vton_tpu.diffusion.schedulers import make_scheduler
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.tps import ConvNetTPS  # noqa: F401 (docs)
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline
    from ladi_vton_tpu.utils.tokenizer import CLIPTokenizer
    from ladi_vton_tpu.data.labels import CATEGORY_PROMPT_TEXT

    policy = default_policy(args.mixed_precision or "bf16")
    dtype = policy.compute_dtype
    root_key = set_seed(args.seed)

    # --- load towers
    unet, unet_vars = zoo.extended_unet(args.dataset,
                                        checkpoint_dir=args.checkpoint_dir,
                                        dtype=dtype)
    emasc, emasc_vars = zoo.emasc(args.dataset,
                                  checkpoint_dir=args.checkpoint_dir,
                                  dtype=dtype)
    adapter, adapter_vars = zoo.inversion_adapter(
        args.dataset, checkpoint_dir=args.checkpoint_dir, dtype=dtype)
    (tps, tps_vars), (refinement, ref_vars) = zoo.warping_module(
        args.dataset, checkpoint_dir=args.checkpoint_dir)
    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)
    text_model, text_vars = zoo.sd2_text_encoder(args.sd2_model_dir,
                                                 dtype=dtype)
    vision, vision_vars = zoo.clip_vit_h_vision(args.clip_vision_dir,
                                                dtype=dtype)
    tokenizer = CLIPTokenizer.from_dir(
        args.tokenizer_dir or str(Path(args.sd2_model_dir) / "tokenizer"))

    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=make_scheduler(args.scheduler))
    params = {"unet": unet_vars, "vae": vae_vars, "emasc": emasc_vars}

    # data-parallel batch inference over the device mesh (the
    # reference's accelerator.prepare DDP eval, src/inference.py:223):
    # weights replicated, batches sharded over the ``data`` axis
    from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh
    from ladi_vton_tpu.parallel.sharding import eval_placement

    mesh = make_mesh(MeshSpec(model=args.tensor_parallel))
    # per-shard flash attention under TP, scoped to this main and reset
    # on the way out (advisor r4; parallel/tp.py tp_attention_scope)
    from ladi_vton_tpu.parallel import tp_attention_scope

    tp_scope = tp_attention_scope(mesh, args.tensor_parallel)
    n_data = mesh.shape["data"]
    args.batch_size = -(-args.batch_size // n_data) * n_data
    put_repl, put_data = eval_placement(mesh)
    params = put_repl(params)

    # --- dataset
    categories = ([args.category] if args.category != "all"
                  else ["dresses", "upper_body", "lower_body"])
    outputlist = ["image", "pose_map", "inpaint_mask", "im_mask",
                  "category", "im_name", "cloth"]
    size = (args.height, args.width)
    if args.dataset == "dresscode":
        dataset = DressCodeDataset(args.dresscode_dataroot, phase="test",
                                   order=args.test_order, radius=5,
                                   outputlist=outputlist,
                                   category=categories, size=size)
    else:
        dataset = VitonHDDataset(args.vitonhd_dataroot, phase="test",
                                 order=args.test_order, radius=5,
                                 outputlist=outputlist, size=size)
    loader = BatchLoader(dataset, args.batch_size,
                         num_workers=args.num_workers, pad_last=True)

    # conditioning assembly compiles separately from the denoise scan so
    # no single XLA program becomes prohibitively large; the weight trees
    # travel as ARGUMENTS — closing over them would bake gigabytes of
    # constants into the program
    cond_params = put_repl({"tps": tps_vars, "ref": ref_vars,
                            "vision": vision_vars, "adapter": adapter_vars,
                            "text": text_vars})

    empty_ids = jnp.asarray(tokenizer([""])[0])
    from ladi_vton_tpu.pipelines.condition import build_condition_fn

    condition = build_condition_fn(
        tps=tps, refinement=refinement, vision=vision, adapter=adapter,
        text_model=text_model, num_vstar=args.num_vstar, dtype=dtype,
        empty_ids=empty_ids, image_size=size)

    sampler = pipe.jit_sample(
        split=True, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale)

    def generate(image, inpaint_mask, pose_map, cloth, im_mask,
                 input_ids, rng):
        warped, ehs, neg_ehs = condition(cond_params, pose_map, cloth,
                                         im_mask, input_ids)
        # 5. try-on pipeline (reference :298-311)
        return sampler(params, image.astype(dtype),
                       inpaint_mask.astype(dtype), pose_map.astype(dtype),
                       warped, ehs, neg_ehs, rng)

    save_dir = os.path.join(args.output_dir, args.test_order)
    os.makedirs(save_dir, exist_ok=True)

    from tqdm import tqdm

    from ladi_vton_tpu.pipelines.drivers import _PipelinedSaver, _quantize_u8

    saver = _PipelinedSaver(save_dir, args.use_png)
    for step, batch in enumerate(tqdm(loader)):
        prompts = [
            f'a photo of a model wearing {CATEGORY_PROMPT_TEXT[c]} '
            f'{" $ " * args.num_vstar}'
            for c in batch["category"]
        ]
        input_ids = jnp.asarray(tokenizer(prompts))
        rng = jax.random.fold_in(root_key, step)
        arrays = put_data({
            k: jnp.asarray(batch[k])
            for k in ("image", "inpaint_mask", "pose_map", "cloth",
                      "im_mask")
        })
        images = generate(
            arrays["image"], arrays["inpaint_mask"], arrays["pose_map"],
            arrays["cloth"], arrays["im_mask"],
            put_data(input_ids), rng)
        saver.push(_quantize_u8(images), batch["im_name"],
                   batch["category"])
    saver.flush()

    if args.compute_metrics:
        from ladi_vton_tpu.metrics.compute import compute_metrics

        metrics = compute_metrics(save_dir, args.test_order, args.dataset,
                                  args.category, ["all"],
                                  args.dresscode_dataroot,
                                  args.vitonhd_dataroot)
        with open(os.path.join(
                save_dir,
                f"metrics_{args.test_order}_{args.category}.json"),
                "w+") as f:
            json.dump(metrics, f, indent=4)
    tp_scope.close()


if __name__ == "__main__":
    main()
