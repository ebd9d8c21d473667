"""Stage-4 training CLI: the extended 31-channel UNet (+ optional
inversion adapter fine-tuning).

Flag surface mirrors reference src/train_vto.py:46-208 (every public
flag preserved; GPU-only knobs are accepted no-ops).  Mechanics
mirrored: conv_in 9->31 surgery on SD-2-inpainting weights (:259-277),
uncond dropout 0.2 (:596-604), MSE on noise (:623-634), grad clip 1.0,
checkpoint every ``--checkpointing_steps`` with keep-last-2 GC +
validation through the try-on pipeline (:661-728), raw ``.pth`` export
of the trained UNet for hub-compatible deployment (:711-713).

TPU-native: one jitted step over the data mesh (grad psum via
shardings), bf16 compute / fp32 params+optimizer, orbax checkpoints.

Extra flags for offline weight routing: --sd2_model_dir,
--clip_vision_dir, --tokenizer_dir, --warped_cloth_root.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="VTO training script.")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--inversion_adapter_dir", type=str, default=None)
    p.add_argument("--inversion_adapter_name", type=str, default="latest")
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="stabilityai/stable-diffusion-2-inpainting")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--test_batch_size", type=int, default=16)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=200001)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
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
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--num_workers_test", type=int, default=8)
    p.add_argument("--test_order", type=str, default="unpaired",
                   choices=["unpaired", "paired"])
    p.add_argument("--uncond_fraction", type=float, default=0.2)
    p.add_argument("--text_usage", type=str, default="inversion_adapter",
                   choices=["none", "noun_chunks", "inversion_adapter"])
    p.add_argument("--cloth_input_type", type=str,
                   choices=["warped", "none"], default="warped")
    p.add_argument("--num_vstar", default=16, type=int)
    p.add_argument("--num_encoder_layers", default=1, type=int)
    p.add_argument("--train_inversion_adapter", action="store_true")
    p.add_argument("--use_clip_cloth_features", action="store_true")
    # offline weight/caption routing
    p.add_argument("--sd2_model_dir", type=str, required=False)
    p.add_argument("--clip_vision_dir", type=str, required=False)
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--caption_file", type=str, default=None)
    p.add_argument("--shard_optimizer_states", action="store_true",
                   help="ZeRO-1: shard Adam moments over the data mesh "
                        "axis (saves ~7GB/chip for the 0.87B UNet); "
                        "numerically identical to replicated DDP")
    p.add_argument("--async_checkpointing", action="store_true",
                   help="overlap checkpoint writes with training: save "
                        "returns after the host snapshot, serialization "
                        "runs on a background thread (core/checkpoint.py)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="2D data x model training: shard the UNet "
                        "attention/FF matmuls (and their Adam moments) "
                        "over a 'model' mesh axis of this size "
                        "(parallel/tp.py); mutually exclusive with "
                        "--shard_optimizer_states")
    p.add_argument("--height", type=int, default=512,
                   help="training resolution (the reference hard-codes "
                        "512x384; smaller sizes drive smoke runs)")
    p.add_argument("--width", type=int, default=384)
    return p.parse_args(argv)


def build_dataset(args, phase: str, order: str, outputlist, size=(512, 384)):
    from ladi_vton_tpu.data import DressCodeDataset, VitonHDDataset

    if args.dataset == "dresscode":
        return DressCodeDataset(args.dresscode_dataroot, phase=phase,
                                order=order, outputlist=outputlist,
                                caption_file=args.caption_file, size=size)
    return VitonHDDataset(args.vitonhd_dataroot, phase=phase, order=order,
                          outputlist=outputlist,
                          caption_file=args.caption_file, size=size)


def main(argv=None):
    args = parse_args(argv)
    if args.dataset == "vitonhd" and args.vitonhd_dataroot is None:
        raise ValueError("VitonHD dataroot must be provided")
    if args.dataset == "dresscode" and args.dresscode_dataroot is None:
        raise ValueError("DressCode dataroot must be provided")

    import jax
    import jax.numpy as jnp

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
    from ladi_vton_tpu.train.runner import (
        LoopConfig,
        Trackers,
        setup_logging,
        train_loop,
    )
    from ladi_vton_tpu.train.steps import (
        TrainState,
        VTOStepConfig,
        make_optimizer,
        make_vto_train_step,
        shard_step,
    )
    from ladi_vton_tpu.utils.tokenizer import CLIPTokenizer

    logger = setup_logging(args.output_dir)
    policy = default_policy(args.mixed_precision)
    dtype = policy.compute_dtype

    # frozen towers
    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)
    text_model, text_vars = zoo.sd2_text_encoder(args.sd2_model_dir,
                                                 dtype=dtype)
    tokenizer = CLIPTokenizer.from_dir(
        args.tokenizer_dir or str(Path(args.sd2_model_dir) / "tokenizer"))

    # trainable UNet: SD-2-inpainting weights + conv_in surgery
    in_ch = 31 if args.cloth_input_type == "warped" else 27
    unet_cfg, unet_vars = zoo.sd2_unet(args.sd2_model_dir,
                                       in_channels=in_ch)
    if args.gradient_checkpointing:
        from flax import linen as nn

        # rematerialized UNet (jax.checkpoint via flax lifted transform),
        # the TPU equivalent of unet.enable_gradient_checkpointing()
        # (reference train_vto.py:290-294)
        unet = nn.remat(UNet2DCondition)(unet_cfg, dtype=dtype)
    else:
        unet = UNet2DCondition(unet_cfg, dtype=dtype)

    adapter = None
    adapter_vars = None
    vision = vision_vars = None
    if args.text_usage == "inversion_adapter":
        # adapter dims are functions of the loaded towers (ViT-H/14 +
        # SD-2 text encoder for real weights, reference
        # train_vto.py:246-252) — derived, not hard-coded, so tiny
        # towers drive the same code path
        vision_cfg = zoo.clip_vision_config(args.clip_vision_dir)
        if args.inversion_adapter_dir:
            # the checkpoint (and its sidecar) own the architecture —
            # keep the module the zoo built for those variables
            adapter, adapter_vars = zoo.inversion_adapter(
                args.dataset,
                checkpoint=str(Path(args.inversion_adapter_dir)
                               / (args.inversion_adapter_name
                                  if args.inversion_adapter_name != "latest"
                                  else f"inversion_adapter_{args.dataset}.pth")),
                dtype=dtype, num_vstar=args.num_vstar,
                num_encoder_layers=args.num_encoder_layers)
        else:
            adapter = InversionAdapter(
                input_dim=vision_cfg.hidden_size,
                hidden_dim=vision_cfg.hidden_size * 4,
                output_dim=text_model.config.hidden_size * args.num_vstar,
                num_encoder_layers=args.num_encoder_layers,
                vision_config=vision_cfg, dtype=dtype)
            n_tokens = (vision_cfg.image_size
                        // vision_cfg.patch_size) ** 2 + 1
            adapter_vars = adapter.init(
                jax.random.key(0),
                jnp.zeros((1, n_tokens, vision_cfg.hidden_size), dtype))
        if not args.use_clip_cloth_features:
            vision, vision_vars = zoo.clip_vit_h_vision(
                args.clip_vision_dir, dtype=dtype)

    # data
    outputlist = ["image", "pose_map", "inpaint_mask", "im_mask",
                  "category", "im_name", "cloth"]
    if args.cloth_input_type == "warped":
        outputlist.append("warped_cloth")
    if args.text_usage == "noun_chunks":
        outputlist.append("captions")
    if args.use_clip_cloth_features:
        outputlist.append("clip_cloth_features")
    train_dataset = build_dataset(args, "train", "paired", tuple(outputlist),
                                  size=(args.height, args.width))
    loader = BatchLoader(train_dataset, args.train_batch_size,
                         shuffle=True, num_workers=args.num_workers,
                         drop_last=True, seed=args.seed)

    # step
    step_cfg = VTOStepConfig(
        uncond_fraction=args.uncond_fraction,
        num_vstar=args.num_vstar,
        text_usage=args.text_usage,
        cloth_input_type=args.cloth_input_type,
        train_inversion_adapter=args.train_inversion_adapter,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
    )
    empty_ids = jnp.asarray(tokenizer([""])[0])
    step_fn = make_vto_train_step(
        unet=unet, vae=vae, text_model=text_model,
        noise_scheduler=DDPMScheduler(), config=step_cfg,
        inversion_adapter=adapter, empty_prompt_ids=empty_ids)

    tx = make_optimizer(
        args.learning_rate, adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2, adam_eps=args.adam_epsilon,
        weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm,
        warmup_steps=args.lr_warmup_steps,
        lr_scheduler=args.lr_scheduler,
        total_steps=args.max_train_steps)
    trainable = {"unet": unet_vars}
    if args.train_inversion_adapter:
        trainable["adapter"] = adapter_vars
    state = TrainState.create(trainable, tx)
    frozen = {"vae": vae_vars, "text": text_vars}
    if adapter is not None and not args.train_inversion_adapter:
        frozen["adapter"] = adapter_vars

    if args.tensor_parallel > 1 and args.shard_optimizer_states:
        raise ValueError(
            "--shard_optimizer_states (ZeRO-1 over the data axis) and "
            "--tensor_parallel are mutually exclusive: under TP the "
            "Adam moments already shard over the model axis with their "
            "parameters (parallel/tp.py tp_train_state)")
    mesh = make_mesh(MeshSpec(model=args.tensor_parallel))
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        from ladi_vton_tpu.parallel.tp import tp_attention_scope

        # per-shard flash attention under TP, scoped to this main and
        # reset on the way out (advisor r4)
        tp_scope = tp_attention_scope(mesh, args.tensor_parallel)
        if args.tensor_parallel > 1:
            from ladi_vton_tpu.parallel.tp import (
                tp_jit_step,
                tp_train_state,
            )

            jitted, shard_batch = tp_jit_step(step_fn, mesh)
            state = tp_train_state(state, mesh)
        else:
            jitted, shard_batch = shard_step(
                step_fn, mesh, state=state,
                zero1=args.shard_optimizer_states)
            if args.shard_optimizer_states:
                from ladi_vton_tpu.train.steps import zero1_state_sharding

                state = jax.device_put(state,
                                       zero1_state_sharding(state, mesh))
            else:
                state = jax.device_put(state, repl)
        frozen = jax.device_put(frozen, repl)

        ckpt = CheckpointManager(args.output_dir, keep=2,
                                 async_save=args.async_checkpointing)
        start_step = 0
        if args.resume_from_checkpoint:
            try:
                which = (args.resume_from_checkpoint
                         if args.resume_from_checkpoint != "latest"
                         else "latest")
                state = ckpt.restore_replacing(state, which)
                start_step = int(state.step)
                logger.info(f"resumed from step {start_step}")
            except FileNotFoundError:
                logger.info("no checkpoint found; training from scratch "
                            "(reference train_vto.py:481-500 fallback)")

        trackers = Trackers(args.report_to, "LaDI_VTON_vto",
                            args.output_dir, vars(args))

        def batch_to_arrays(batch):
            import numpy as np

            prompts = _make_prompts(batch, args)
            arrays = {
                "image": batch["image"],
                "im_mask": batch["im_mask"],
                "inpaint_mask": batch["inpaint_mask"],
                "pose_map": batch["pose_map"],
                "input_ids": tokenizer(prompts),
            }
            if args.cloth_input_type == "warped":
                arrays["warped_cloth"] = batch["warped_cloth"]
            if args.text_usage == "inversion_adapter":
                if args.use_clip_cloth_features:
                    arrays["clip_cloth_features"] = np.asarray(
                        batch["clip_cloth_features"])
                else:
                    arrays["clip_cloth_features"] = np.asarray(
                        _vision_features(batch["cloth"]))
            return arrays

        _vision_apply = None
        if vision is not None:
            from ladi_vton_tpu.ops.resize import resize_bilinear

            clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
            clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

            @jax.jit
            def _vision_apply(vv, cloth):
                from ladi_vton_tpu.parallel.tp import tp_attention_mesh

                x = jnp.clip(resize_bilinear(
                    (jnp.asarray(cloth) + 1.0) * 0.5, (224, 224)), 0, 1)
                x = ((x - clip_mean) / clip_std).astype(dtype)
                # the replicated vision tower must NOT reroute through
                # the TP shard_map path (advisor r4): the knob is read
                # at trace time, so mask it for this trace
                with tp_attention_mesh(None):
                    return vision.apply(vv, x)

        def _vision_features(cloth):
            return _vision_apply(vision_vars, jnp.asarray(cloth))

        def _make_prompts(batch, args):
            if args.text_usage == "noun_chunks":
                return batch["captions"]
            if args.text_usage == "none":
                return [""] * len(batch["category"])
            return [
                f'a photo of a model wearing '
                f'{CATEGORY_PROMPT_TEXT[c]} {" $ " * args.num_vstar}'
                for c in batch["category"]
            ]

        def on_checkpoint(step, state):
            # raw .pth export for deployment (reference :711-720) in the
            # diffusers key layout hub.convert reads back, plus an
            # architecture sidecar so cli.eval/zoo rebuild non-default
            # (e.g. tiny) towers — the train->export->eval circle
            import dataclasses as _dc
            import json as _json

            from ladi_vton_tpu.core.checkpoint import (
                inversion_adapter_torch_key_map,
                unet_torch_key_map,
            )

            pth = Path(args.output_dir) / f"unet_{step}.pth"
            export_torch_state(
                {"params": jax.device_get(state.params["unet"])["params"]},
                pth, key_map=unet_torch_key_map)
            pth.with_suffix(".config.json").write_text(_json.dumps({
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in _dc.asdict(unet_cfg).items()}))
            if args.train_inversion_adapter:
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
            # validation images + metrics through the try-on pipeline
            # (reference :661-699); best-effort — training never dies on
            # a validation failure (reference wraps in try/except too)
            try:
                _run_validation(step, state)
            except Exception as e:  # noqa: BLE001
                logger.info(f"validation at step {step} skipped: {e}")

        def _run_validation(step, state):
            from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
            from ladi_vton_tpu.pipelines.drivers import (
                generate_images_from_tryon_pipe,
            )
            from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

            outputlist_v = [o for o in outputlist if o != "captions"] + (
                ["captions"] if args.text_usage == "noun_chunks" else [])
            test_dataset = build_dataset(args, "test", args.test_order,
                                         tuple(outputlist_v),
                                         size=(args.height, args.width))
            test_loader = BatchLoader(test_dataset, args.test_batch_size,
                                      num_workers=args.num_workers_test,
                                      pad_last=True)
            pipe = TryOnPipeline(unet=unet, vae=vae, emasc=None,
                                 scheduler=DDIMScheduler())
            val_params = {
                "unet": jax.device_get(state.params["unet"]),
                "vae": vae_vars,
            }
            adapter_v = (state.params.get("adapter")
                         if args.train_inversion_adapter else adapter_vars)
            save_dir = str(Path(args.output_dir) / f"imgs_step_{step}"
                           / args.test_order)
            generate_images_from_tryon_pipe(
                pipe, val_params, text_model, text_vars, tokenizer,
                test_loader, save_dir, inversion_adapter=adapter,
                adapter_vars=adapter_v, vision=vision,
                vision_vars=vision_vars, text_usage=args.text_usage,
                num_vstar=args.num_vstar, seed=args.seed,
                cloth_input_type=args.cloth_input_type)
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
            jitted_step=jitted, shard_batch=shard_batch,
            ckpt_manager=ckpt,
            loop=LoopConfig(max_train_steps=args.max_train_steps,
                            checkpointing_steps=args.checkpointing_steps,
                            seed=args.seed),
            logger=logger, trackers=trackers, start_step=start_step,
            on_checkpoint=on_checkpoint,
            batch_to_arrays=batch_to_arrays)
        trackers.finish()
        tp_scope.close()
        logger.info(f"done at step {final_step}")


def _forever(loader):
    while True:
        yield from loader


if __name__ == "__main__":
    main()
