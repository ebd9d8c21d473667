"""Stage-2 training CLI: EMASC adapters (VAE frozen).

Flag surface mirrors reference src/train_emasc.py (argparse block;
README.md "Train the EMASC").  Mechanics mirrored: L1(recon, image) +
0.5 * VGG with masked-feature injection decode (:386-418), grad clip
1.0, checkpoints every ``--checkpointing_steps`` with keep-last-2 GC,
VAE reconstruction dumps + raw ``emasc_{step}.pth`` export (:430-473).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EMASC training script.")
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
    p.add_argument("--max_train_steps", type=int, default=40001)
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
    p.add_argument("--checkpointing_steps", type=int, default=10000)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--async_checkpointing", action="store_true",
                   help="overlap checkpoint writes with training "
                        "(background serialization; core/checkpoint.py)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--num_workers_test", type=int, default=8)
    p.add_argument("--test_order", type=str, default="unpaired",
                   choices=["unpaired", "paired"])
    p.add_argument("--emasc_type", type=str, default="nonlinear",
                   choices=["linear", "nonlinear"])
    p.add_argument("--emasc_kernel", type=int, default=3)
    p.add_argument("--emasc_padding", type=int, default=1)
    p.add_argument("--vgg_weight", type=float, default=0.5)
    # offline weight routing
    p.add_argument("--sd2_model_dir", type=str, required=False)
    p.add_argument("--vgg_weights", type=str, default=None,
                   help="torchvision vgg19 .pth for the perceptual loss")
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

    from ladi_vton_tpu.cli.train_vto import build_dataset
    from ladi_vton_tpu.core.checkpoint import (
        CheckpointManager,
        export_torch_state,
    )
    from ladi_vton_tpu.core.dtypes import default_policy
    from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh
    from ladi_vton_tpu.data.loader import BatchLoader
    from ladi_vton_tpu.hub import convert as C
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.emasc import EMASC, emasc_channels
    from ladi_vton_tpu.models.vgg import VGG19Features
    from ladi_vton_tpu.train.runner import (
        LoopConfig,
        Trackers,
        run_checkpoint_validation,
        setup_logging,
        train_loop,
    )
    from ladi_vton_tpu.train.steps import (
        TrainState,
        make_emasc_train_step,
        make_optimizer,
        shard_step,
    )

    logger = setup_logging(args.output_dir)
    policy = default_policy(args.mixed_precision)
    dtype = policy.compute_dtype

    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)
    if args.emasc_padding != args.emasc_kernel // 2:
        raise ValueError(
            "this port derives EMASC padding as kernel//2 (shape-"
            f"preserving); got kernel={args.emasc_kernel} "
            f"padding={args.emasc_padding}")
    # channel plan derived from the loaded VAE (reproduces the
    # reference's hard-coded plan for the SD-2 VAE; models/emasc.py)
    emasc_in, emasc_out = emasc_channels(vae.config)
    emasc = EMASC(in_channels=emasc_in, out_channels=emasc_out,
                  kind=args.emasc_type, kernel_size=args.emasc_kernel,
                  dtype=dtype)
    emasc_vars = emasc.init(jax.random.key(args.seed), [
        jnp.zeros((1, 8, 8, c), dtype) for c in emasc.in_channels])

    vgg = VGG19Features(dtype=dtype)
    if args.vgg_weights:
        vgg_vars = zoo._to_jax(C.convert_vgg19(
            C.load_torch_state(args.vgg_weights)))
    else:
        logger.info("no --vgg_weights given: perceptual loss uses random "
                    "VGG features (smoke mode only)")
        vgg_vars = vgg.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3),
                                                         dtype))

    outputlist = ("image", "im_mask", "inpaint_mask", "im_name", "category")
    train_dataset = build_dataset(args, "train", "paired", outputlist,
                                  size=(args.height, args.width))
    loader = BatchLoader(train_dataset, args.train_batch_size, shuffle=True,
                         num_workers=args.num_workers, drop_last=True,
                         seed=args.seed)

    step_fn = make_emasc_train_step(
        vae=vae, emasc=emasc, vgg=vgg, vgg_weight=args.vgg_weight,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
    tx = make_optimizer(args.learning_rate, adam_beta1=args.adam_beta1,
                        adam_beta2=args.adam_beta2,
                        adam_eps=args.adam_epsilon,
                        weight_decay=args.adam_weight_decay,
                        max_grad_norm=args.max_grad_norm,
                        warmup_steps=args.lr_warmup_steps,
                        lr_scheduler=args.lr_scheduler,
                        total_steps=args.max_train_steps)
    state = TrainState.create({"emasc": emasc_vars}, tx)
    frozen = {"vae": vae_vars, "vgg": vgg_vars}

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

        trackers = Trackers(args.report_to, "LaDI_VTON_Emasc",
                            args.output_dir, vars(args))

        def batch_to_arrays(batch):
            return {"image": batch["image"], "im_mask": batch["im_mask"],
                    "inpaint_mask": batch["inpaint_mask"]}

        def on_checkpoint(step, state):
            import json as _json

            from ladi_vton_tpu.core.checkpoint import emasc_torch_key_map

            pth = Path(args.output_dir) / f"emasc_{step}.pth"
            export_torch_state(
                {"params": jax.device_get(
                    state.params["emasc"])["params"]},
                pth, key_map=emasc_torch_key_map)
            pth.with_suffix(".config.json").write_text(_json.dumps({
                "in_channels": list(emasc.in_channels),
                "out_channels": list(emasc.out_channels)}))
            # VAE+EMASC reconstruction dumps + metric eval at checkpoint
            # boundaries (reference train_emasc.py:430-473).  Only
            # expected missing artifacts are tolerated; real validation
            # bugs raise (policy in run_checkpoint_validation).
            run_checkpoint_validation(
                lambda: _run_validation(step, state), step, logger)

        def _run_validation(step, state):
            from ladi_vton_tpu.pipelines.drivers import (
                extract_save_vae_images,
            )

            test_dataset = build_dataset(
                args, "test", args.test_order,
                ("image", "im_mask", "inpaint_mask", "im_name",
                 "category"), size=(args.height, args.width))
            test_loader = BatchLoader(test_dataset, args.test_batch_size,
                                      num_workers=args.num_workers_test,
                                      pad_last=True)
            save_dir = str(Path(args.output_dir)
                           / f"imgs_step_{step}" / args.test_order)
            extract_save_vae_images(
                vae, vae_vars, emasc,
                jax.device_get(state.params["emasc"]), test_loader,
                save_dir, seed=args.seed)
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

        def emasc_jitted(state, frozen, batch, rng):
            return jitted(state, frozen, batch, rng)

        state, final_step = train_loop(
            state=state, frozen=frozen,
            loader=_forever(loader), jitted_step=emasc_jitted,
            shard_batch=shard_batch, ckpt_manager=ckpt,
            loop=LoopConfig(max_train_steps=args.max_train_steps,
                            checkpointing_steps=args.checkpointing_steps,
                            seed=args.seed),
            logger=logger, trackers=trackers, start_step=start_step,
            on_checkpoint=on_checkpoint,
            batch_to_arrays=batch_to_arrays)
        trackers.finish()
        logger.info(f"done at step {final_step}")


def _forever(loader):
    while True:
        yield from loader


if __name__ == "__main__":
    main()
