"""Stage-3 training CLI: inversion-adapter pretraining.

Flag surface mirrors reference src/train_inversion_adapter.py (argparse
block; README.md "Train the inversion adapter").  Mechanics mirrored:
standard 9-channel SD-2-inpainting UNet (unmodified, :243), prompt
'a photo of a model wearing <category> $x16' (:459-466), DDPM noising
(:450-455), MSE on noise with only the adapter trainable (:511),
optional precomputed CLIP features (:484-494), checkpoint + raw
``inversion_adapter_{step}.pth`` export.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Inversion adapter training script.")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="stabilityai/stable-diffusion-2-inpainting")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--test_batch_size", type=int, default=16)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=200001)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_scheduler", type=str,
                   default="constant_with_warmup")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-08)
    p.add_argument("--max_grad_norm", default=1.0, type=float)
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--report_to", type=str, default="wandb")
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--checkpointing_steps", type=int, default=50000)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--async_checkpointing", action="store_true",
                   help="overlap checkpoint writes with training "
                        "(background serialization; core/checkpoint.py)")
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--num_workers_test", type=int, default=8)
    p.add_argument("--test_order", type=str, default="unpaired",
                   choices=["unpaired", "paired"])
    p.add_argument("--num_vstar", default=16, type=int)
    p.add_argument("--num_encoder_layers", default=1, type=int)
    p.add_argument("--use_clip_cloth_features", action="store_true")
    p.add_argument("--adapter_dropout", type=float, default=0.5)
    # offline weight routing
    p.add_argument("--sd2_model_dir", type=str, required=False)
    p.add_argument("--clip_vision_dir", type=str, required=False)
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--caption_file", type=str, default=None)
    p.add_argument("--height", type=int, default=512,
                   help="training resolution (the reference hard-codes "
                        "512x384; smaller sizes drive smoke runs)")
    p.add_argument("--width", type=int, default=384)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladi_vton_tpu.cli.train_vto import build_dataset, _forever
    from ladi_vton_tpu.core.checkpoint import (
        CheckpointManager,
        export_torch_state,
    )
    from ladi_vton_tpu.core.dtypes import default_policy
    from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh
    from ladi_vton_tpu.data.labels import CATEGORY_PROMPT_TEXT
    from ladi_vton_tpu.data.loader import BatchLoader
    from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.inversion_adapter import InversionAdapter
    from ladi_vton_tpu.models.unet_condition import UNet2DCondition
    from ladi_vton_tpu.ops.resize import resize_bilinear
    from ladi_vton_tpu.train.runner import (
        LoopConfig,
        Trackers,
        run_checkpoint_validation,
        setup_logging,
        train_loop,
    )
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer, shard_step
    from ladi_vton_tpu.train.tps_steps import (
        make_inversion_adapter_train_step,
    )
    from ladi_vton_tpu.utils.tokenizer import CLIPTokenizer

    logger = setup_logging(args.output_dir)
    policy = default_policy(args.mixed_precision)
    dtype = policy.compute_dtype

    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)
    text_model, text_vars = zoo.sd2_text_encoder(args.sd2_model_dir,
                                                 dtype=dtype)
    tokenizer = CLIPTokenizer.from_dir(
        args.tokenizer_dir or str(Path(args.sd2_model_dir) / "tokenizer"))
    # stock 9-channel inpainting UNet, frozen (but backprop flows
    # THROUGH it to the adapter, so rematerialize it under
    # --gradient_checkpointing — reference
    # train_inversion_adapter.py:262-264; the UNet dominates the
    # activation footprint, the text encoder's share is negligible)
    unet9_cfg, unet9_vars = zoo.sd2_unet(args.sd2_model_dir, in_channels=9)
    if args.gradient_checkpointing:
        from flax import linen as nn

        unet9 = nn.remat(UNet2DCondition)(unet9_cfg, dtype=dtype)
    else:
        unet9 = UNet2DCondition(unet9_cfg, dtype=dtype)

    # adapter dims derived from the loaded towers (ViT-H/14 + SD-2 text
    # for real weights, reference train_inversion_adapter.py:246-256)
    vision_cfg = zoo.clip_vision_config(args.clip_vision_dir)
    adapter = InversionAdapter(
        input_dim=vision_cfg.hidden_size,
        hidden_dim=vision_cfg.hidden_size * 4,
        output_dim=text_model.config.hidden_size * args.num_vstar,
        num_encoder_layers=args.num_encoder_layers,
        dropout=args.adapter_dropout,
        vision_config=vision_cfg, dtype=dtype)
    n_tokens = (vision_cfg.image_size // vision_cfg.patch_size) ** 2 + 1
    adapter_vars = adapter.init(
        jax.random.key(args.seed),
        jnp.zeros((1, n_tokens, vision_cfg.hidden_size), dtype))

    vision = vision_vars = None
    if not args.use_clip_cloth_features:
        vision, vision_vars = zoo.clip_vit_h_vision(args.clip_vision_dir,
                                                    dtype=dtype)

    outputlist = ["image", "im_mask", "inpaint_mask", "category",
                  "im_name", "cloth"]
    if args.use_clip_cloth_features:
        outputlist.append("clip_cloth_features")
    train_dataset = build_dataset(args, "train", "paired",
                                  tuple(outputlist),
                                  size=(args.height, args.width))
    loader = BatchLoader(train_dataset, args.train_batch_size, shuffle=True,
                         num_workers=args.num_workers, drop_last=True,
                         seed=args.seed)

    step_fn = make_inversion_adapter_train_step(
        unet9=unet9, vae=vae, text_model=text_model,
        inversion_adapter=adapter, noise_scheduler=DDPMScheduler(),
        num_vstar=args.num_vstar,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
    tx = make_optimizer(args.learning_rate, adam_beta1=args.adam_beta1,
                        adam_beta2=args.adam_beta2,
                        adam_eps=args.adam_epsilon,
                        weight_decay=args.adam_weight_decay,
                        max_grad_norm=args.max_grad_norm,
                        warmup_steps=args.lr_warmup_steps,
                        lr_scheduler=args.lr_scheduler,
                        total_steps=args.max_train_steps)
    state = TrainState.create({"adapter": adapter_vars}, tx)
    frozen = {"vae": vae_vars, "text": text_vars, "unet": unet9_vars}

    clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    vision_apply = None
    if vision is not None:
        @jax.jit
        def vision_apply(vv, cloth):
            x = jnp.clip(resize_bilinear((cloth + 1.0) * 0.5, (224, 224)),
                         0, 1)
            x = ((x - clip_mean) / clip_std).astype(dtype)
            return vision.apply(vv, x)

    mesh = make_mesh(MeshSpec())
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        jitted, shard_batch = shard_step(step_fn, mesh)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        frozen = jax.device_put(frozen, NamedSharding(mesh, P()))

        ckpt = CheckpointManager(args.output_dir, keep=2,
                                 async_save=args.async_checkpointing)
        start_step = 0
        if args.resume_from_checkpoint:
            try:
                state = ckpt.restore_replacing(
                    state, args.resume_from_checkpoint)
                start_step = int(state.step)
                logger.info(f"resumed from step {start_step}")
            except FileNotFoundError:
                logger.info("no checkpoint found; starting fresh")

        trackers = Trackers(args.report_to, "LaDI_VTON_inversion_adapter",
                            args.output_dir, vars(args))

        def batch_to_arrays(batch):
            prompts = [
                f'a photo of a model wearing '
                f'{CATEGORY_PROMPT_TEXT[c]} {" $ " * args.num_vstar}'
                for c in batch["category"]
            ]
            if args.use_clip_cloth_features:
                feats = np.asarray(batch["clip_cloth_features"])
            else:
                feats = np.asarray(vision_apply(vision_vars, jnp.asarray(batch["cloth"])))
            return {
                "image": batch["image"],
                "im_mask": batch["im_mask"],
                "inpaint_mask": batch["inpaint_mask"],
                "input_ids": tokenizer(prompts),
                "clip_cloth_features": feats,
            }

        def on_checkpoint(step, state):
            import dataclasses as _dc
            import json as _json

            from ladi_vton_tpu.core.checkpoint import (
                inversion_adapter_torch_key_map,
            )

            pth = Path(args.output_dir) / f"inversion_adapter_{step}.pth"
            export_torch_state(
                {"params": jax.device_get(
                    state.params["adapter"])["params"]},
                pth, key_map=inversion_adapter_torch_key_map)
            pth.with_suffix(".config.json").write_text(_json.dumps({
                "input_dim": adapter.input_dim,
                "hidden_dim": adapter.hidden_dim,
                "output_dim": adapter.output_dim,
                "num_encoder_layers": adapter.num_encoder_layers,
                "vision_config": _dc.asdict(adapter.vision_config)}))
            # adapter validation through the PLAIN SD inpaint pipeline +
            # metrics (reference train_inversion_adapter.py:546-572,
            # image_from_pipe.py:139-218).  Only expected missing
            # artifacts are tolerated; real validation bugs raise
            # (policy in run_checkpoint_validation).
            run_checkpoint_validation(
                lambda: _run_validation(step, state), step, logger)

        def _run_validation(step, state):
            from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
            from ladi_vton_tpu.pipelines.inpaint import (
                InpaintPipeline,
                generate_images_inversion_adapter,
            )

            test_dataset = build_dataset(args, "test", args.test_order,
                                         tuple(outputlist),
                                         size=(args.height, args.width))
            test_loader = BatchLoader(test_dataset, args.test_batch_size,
                                      num_workers=args.num_workers_test,
                                      pad_last=True)
            pipe = InpaintPipeline(unet=unet9, vae=vae,
                                   scheduler=DDIMScheduler())
            save_dir = str(Path(args.output_dir)
                           / f"imgs_step_{step}" / args.test_order)
            generate_images_inversion_adapter(
                pipe, {"unet": unet9_vars, "vae": vae_vars},
                text_model, text_vars, tokenizer, adapter,
                jax.device_get(state.params["adapter"]),
                vision, vision_vars, test_loader, save_dir,
                num_vstar=args.num_vstar, seed=args.seed)
            try:
                from ladi_vton_tpu.metrics.compute import compute_metrics

                metrics = compute_metrics(
                    save_dir, args.test_order, args.dataset, "all",
                    ["all"], args.dresscode_dataroot,
                    args.vitonhd_dataroot)
                trackers.log({f"val/{k}": v for k, v in metrics.items()},
                             step)
                logger.info(f"validation metrics at {step}: {metrics}")
            except FileNotFoundError as e:
                logger.info(f"metric weights unavailable: {e}")

        state, final_step = train_loop(
            state=state, frozen=frozen, loader=_forever(loader),
            jitted_step=jitted, shard_batch=shard_batch, ckpt_manager=ckpt,
            loop=LoopConfig(max_train_steps=args.max_train_steps,
                            checkpointing_steps=args.checkpointing_steps,
                            seed=args.seed),
            logger=logger, trackers=trackers, start_step=start_step,
            on_checkpoint=on_checkpoint, batch_to_arrays=batch_to_arrays)
        trackers.finish()
        logger.info(f"done at step {final_step}")


if __name__ == "__main__":
    main()
