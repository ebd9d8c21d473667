"""Stage-1 training CLI: TPS warping + refinement, and warped-cloth
extraction.

Flag surface mirrors reference src/train_tps.py:283-312 (argparse) and
README.md "Train the warping module".  Mechanics mirrored:

* Phase A — TPS at 256x192 (the reference mutates dataset height/width
  in place, :450-451; here two dataset configs): L1 + const_weight *
  constraint sum, Adam(0.5, 0.99), epoch checkpoints in one rolling
  bundle (:509-515), resume continues at the stored epoch (:407-414).
* Phase B — refinement at 512x384 (:521-536): L1 * l1_weight + VGG *
  vgg_weight.
* Per-epoch evaluation on the paired AND unpaired test sets (L1 + VGG
  warp losses, reference compute_metric :29-92) with image grids logged
  through the trackers (:474-490).
* ``--only_extraction`` early path (:416-441) and the final extraction
  of warped cloths for train+test paired and test unpaired into
  ``<save_path>/warped_cloths{,_unpaired}/<dataset>/<category>/`` —
  the build-graph edge train_vto/eval/train_emasc consume (:590-614).

Dense-pose input (``--dense``) swaps the 18-channel keypoint pose map
for the dense UV map (agnostic 5ch), like the reference's dense branch.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   choices=["dresscode", "vitonhd"])
    p.add_argument("--dresscode_dataroot", type=str)
    p.add_argument("--vitonhd_dataroot", type=str)
    p.add_argument("--checkpoints_dir", type=str, required=True)
    p.add_argument("--exp_name", type=str, required=True)
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--const_weight", type=float, default=0.01)
    p.add_argument("--l1_weight", type=float, default=1.0)
    p.add_argument("--vgg_weight", type=float, default=0.25)
    p.add_argument("--epochs_tps", type=int, default=50)
    p.add_argument("--epochs_refinement", type=int, default=50)
    p.add_argument("--wandb_log", default=False, action="store_true",
                   help="use wandb to log the training")
    p.add_argument("--wandb_project", type=str, default="LaDI_VTON_tps")
    p.add_argument("--wandb_entity", type=str, default=None)
    p.add_argument("--dense", action="store_true",
                   help="use dense UV pose instead of keypoint heatmaps")
    p.add_argument("--only_extraction", action="store_true")
    p.add_argument("--save_path", type=str, default=None,
                   help="where to write the warped cloth caches (default: "
                        "a 'cache' dir next to the dataroot)")
    p.add_argument("--vgg_weights", type=str, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--report_to", type=str, default=None,
                   help="extra tracker backend (tensorboard); wandb is "
                        "controlled by --wandb_log like the reference")
    return p.parse_args(argv)


def _pose_key(args) -> str:
    return "dense_uv" if args.dense else "pose_map"


def _build(args, phase, order, size):
    from ladi_vton_tpu.data import DressCodeDataset, VitonHDDataset

    outputlist = ("c_name", "im_name", "cloth", "image", "im_cloth",
                  "im_mask", "category", _pose_key(args))
    if args.dataset == "dresscode":
        return DressCodeDataset(args.dresscode_dataroot, phase=phase,
                                order=order, outputlist=outputlist,
                                size=size)
    return VitonHDDataset(args.vitonhd_dataroot, phase=phase, order=order,
                          outputlist=outputlist, size=size)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladi_vton_tpu.core.checkpoint import CheckpointManager
    from ladi_vton_tpu.data.loader import BatchLoader
    from ladi_vton_tpu.hub import convert as Cv
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.refinement import UNetVanilla
    from ladi_vton_tpu.models.tps import ConvNetTPS
    from ladi_vton_tpu.models.vgg import VGG19Features, vgg_loss
    from ladi_vton_tpu.ops.grid_sample import grid_sample
    from ladi_vton_tpu.ops.resize import resize_bilinear
    from ladi_vton_tpu.train.runner import Trackers, setup_logging
    from ladi_vton_tpu.train.tps_steps import (
        MutableTrainState,
        make_refinement_train_step,
        make_tps_train_step,
        tps_optimizer,
        warp_and_refine,
    )

    logger = setup_logging(os.path.join(args.checkpoints_dir,
                                        args.exp_name))
    out_dir = Path(args.checkpoints_dir) / args.exp_name
    pose_ch = 2 if args.dense else 18
    agn_ch = 3 + pose_ch  # masked person + pose

    tps = ConvNetTPS(height=256, width=192, input_nc_b=agn_ch)
    refinement = UNetVanilla(out_channels=3, bilinear=True)
    vgg = VGG19Features()

    rng = jax.random.key(args.seed)
    tps_variables = tps.init(rng, jnp.zeros((1, 256, 192, 3)),
                             jnp.zeros((1, 256, 192, agn_ch)))
    ref_variables = refinement.init(
        rng, jnp.zeros((1, args.height, args.width, agn_ch + 3)))
    if args.vgg_weights:
        vgg_vars = zoo._to_jax(Cv.convert_vgg19(
            Cv.load_torch_state(args.vgg_weights)))
    else:
        logger.info("no --vgg_weights: random VGG features (smoke only)")
        vgg_vars = vgg.init(rng, jnp.zeros((1, 64, 64, 3)))

    ckpt = CheckpointManager(out_dir, keep=2)

    tps_state = MutableTrainState.create(tps_variables,
                                         tps_optimizer(args.lr))
    ref_state = MutableTrainState.create(ref_variables,
                                         tps_optimizer(args.lr))
    # Resume CONTINUES training at the stored epoch (reference
    # train_tps.py:404-414 start_epoch) — checkpoint-{e} holds state
    # after epoch e-1, so latest_step() is the next epoch to run.
    start_epoch = 0
    try:
        tps_state, ref_state = ckpt.restore((tps_state, ref_state))
        start_epoch = ckpt.latest_step() or 0
        logger.info(f"resumed warping checkpoint at epoch {start_epoch}")
    except FileNotFoundError:
        if args.only_extraction:
            raise SystemExit(
                "No checkpoint found; before extracting warped cloth "
                "images, please train the model first.")

    report_to = "wandb" if args.wandb_log else args.report_to
    trackers = Trackers(report_to, args.wandb_project, str(out_dir),
                        vars(args), entity=args.wandb_entity)

    def collate_pose(batch):
        pose = batch[_pose_key(args)]
        if args.dense and pose.shape[-1] != 2:
            pose = np.transpose(pose, (0, 2, 3, 1))  # CHW -> HWC
        return pose

    def batch_arrays(batch):
        return {
            "cloth": jnp.asarray(batch["cloth"]),
            "im_cloth": jnp.asarray(batch["im_cloth"]),
            "im_mask": jnp.asarray(batch["im_mask"]),
            "pose": jnp.asarray(collate_pose(batch)),
        }

    # -------- per-epoch evaluation (reference compute_metric :29-92):
    # L1 + VGG between the warped (optionally refined) cloth and the
    # ground-truth worn garment, on the full-res test sets.
    @jax.jit
    def _eval_batch_tps(tps_vars, vgg_vs, arrays):
        low_cloth = resize_bilinear(arrays["cloth"], (256, 192))
        low_mask = resize_bilinear(arrays["im_mask"], (256, 192))
        low_pose = resize_bilinear(arrays["pose"], (256, 192))
        agnostic = jnp.concatenate([low_mask, low_pose], axis=-1)
        grid, *_ = tps.apply(tps_vars, low_cloth, agnostic)
        grid_hr = resize_bilinear(grid, (args.height, args.width))
        warped = grid_sample(arrays["cloth"], grid_hr,
                             padding_mode="border")
        l1 = jnp.mean(jnp.abs(warped - arrays["im_cloth"]))
        perc = vgg_loss(vgg, vgg_vs, warped, arrays["im_cloth"])
        return l1, perc, jnp.clip(warped, -1.0, 1.0)

    @jax.jit
    def _eval_batch_refined(tps_vars, ref_vars, vgg_vs, arrays):
        warped = warp_and_refine(
            tps, tps_vars, refinement, ref_vars, cloth=arrays["cloth"],
            im_mask=arrays["im_mask"], pose=arrays["pose"],
            height=args.height, width=args.width)
        l1 = jnp.mean(jnp.abs(warped - arrays["im_cloth"]))
        perc = vgg_loss(vgg, vgg_vs, warped, arrays["im_cloth"])
        return l1, perc, warped

    def eval_epoch(dataset, use_refinement: bool):
        loader = BatchLoader(dataset, args.batch_size,
                             num_workers=args.workers)
        l1s, vggs, visual = [], [], None
        for batch in loader:
            arrays = batch_arrays(batch)
            if use_refinement:
                l1, perc, warped = _eval_batch_refined(
                    tps_state.variables, ref_state.variables, vgg_vars,
                    arrays)
            else:
                l1, perc, warped = _eval_batch_tps(
                    tps_state.variables, vgg_vars, arrays)
            l1s.append(float(l1))
            vggs.append(float(perc))
            # Per-sample panel like the reference grid
            # (train_tps.py:474-490): image | cloth | gt | warped side
            # by side along width, so every logged row shows all four.
            visual = np.concatenate([
                np.asarray(batch["image"]),
                np.asarray(arrays["cloth"]),
                np.asarray(arrays["im_cloth"]),
                np.asarray(warped),
            ], axis=2)
        if not l1s:  # empty test split: no NaN means
            return 0.0, 0.0, None
        return (float(np.mean(l1s)), float(np.mean(vggs)),
                (visual + 1.0) / 2.0 if visual is not None else None)

    def run_eval_and_log(epoch, phase_tag, train_metrics,
                         use_refinement: bool):
        test_paired = _build(args, "test", "paired",
                             (args.height, args.width))
        test_unpaired = _build(args, "test", "unpaired",
                               (args.height, args.width))
        l1_p, vgg_p, vis_p = eval_epoch(test_paired, use_refinement)
        l1_u, vgg_u, vis_u = eval_epoch(test_unpaired, use_refinement)
        metrics = {
            **{f"train/{k}": v for k, v in train_metrics.items()},
            "eval/eval_loss_paired": l1_p,
            "eval/eval_vgg_loss_paired": vgg_p,
            "eval/eval_loss_unpaired": l1_u,
            "eval/eval_vgg_loss_unpaired": vgg_u,
        }
        logger.info(f"{phase_tag} epoch {epoch}: {metrics}")
        trackers.log(metrics, epoch)
        if vis_p is not None:
            trackers.log_images("images_paired", vis_p[:8], epoch,
                                output_dir=str(out_dir))
        if vis_u is not None:
            trackers.log_images("images_unpaired", vis_u[:8], epoch,
                                output_dir=str(out_dir))

    total_epochs = args.epochs_tps + args.epochs_refinement
    if not args.only_extraction:
        # ---------------- phase A: TPS at 256x192
        if start_epoch < args.epochs_tps:
            low_train = _build(args, "train", "paired", (256, 192))
            loader = BatchLoader(low_train, args.batch_size, shuffle=True,
                                 num_workers=args.workers, drop_last=True,
                                 seed=args.seed)
            step_a = jax.jit(make_tps_train_step(
                tps=tps, const_weight=args.const_weight))
            for epoch in range(start_epoch, args.epochs_tps):
                losses, l1s, consts = [], [], []
                for batch in loader:
                    tps_state, metrics = step_a(tps_state,
                                                batch_arrays(batch))
                    losses.append(float(metrics["loss"]))
                    l1s.append(float(metrics["l1"]))
                    consts.append(float(metrics["const"]))
                run_eval_and_log(
                    epoch, "tps",
                    {"loss": float(np.mean(losses)),
                     "l1_loss": float(np.mean(l1s)),
                     "const_loss": float(np.mean(consts)),
                     "vgg_loss": 0.0},
                    use_refinement=False)
                ckpt.save(epoch + 1, (tps_state, ref_state))
            start_epoch = args.epochs_tps

        # ---------------- phase B: refinement at full res
        if start_epoch < total_epochs:
            hi_train = _build(args, "train", "paired",
                              (args.height, args.width))
            loader = BatchLoader(hi_train, args.batch_size, shuffle=True,
                                 num_workers=args.workers, drop_last=True,
                                 seed=args.seed)
            step_b = jax.jit(make_refinement_train_step(
                tps=tps, refinement=refinement, vgg=vgg,
                l1_weight=args.l1_weight, vgg_weight=args.vgg_weight,
                height=args.height, width=args.width))
            frozen = {"tps": tps_state.variables, "vgg": vgg_vars}
            for epoch in range(start_epoch, total_epochs):
                losses, l1s, percs = [], [], []
                for batch in loader:
                    ref_state, metrics = step_b(ref_state, frozen,
                                                batch_arrays(batch))
                    losses.append(float(metrics["loss"]))
                    l1s.append(float(metrics["l1"]))
                    percs.append(float(metrics["vgg"]))
                run_eval_and_log(
                    epoch, "refinement",
                    {"loss": float(np.mean(losses)),
                     "l1_loss": float(np.mean(l1s)),
                     "const_loss": 0.0,
                     "vgg_loss": float(np.mean(percs))},
                    use_refinement=True)
                ckpt.save(epoch + 1, (tps_state, ref_state))

    # ---------------- extraction (reference :590-614)
    from PIL import Image

    if args.save_path:
        cache_root = Path(args.save_path)
    else:
        cache_root = Path(
            args.dresscode_dataroot
            or args.vitonhd_dataroot).parent / "cache"

    extract_fn = jax.jit(lambda cloth, im_mask, pose: warp_and_refine(
        tps, tps_state.variables, refinement, ref_state.variables,
        cloth=cloth, im_mask=im_mask, pose=pose,
        height=args.height, width=args.width))

    def extract(dataset, save_sub: str):
        loader = BatchLoader(dataset, args.batch_size,
                             num_workers=args.workers, pad_last=True)
        save_root = cache_root / save_sub / args.dataset
        seen = set()
        for batch in loader:
            warped = extract_fn(jnp.asarray(batch["cloth"]),
                                jnp.asarray(batch["im_mask"]),
                                jnp.asarray(collate_pose(batch)))
            warped = np.asarray(
                jnp.clip((warped + 1) / 2, 0, 1))
            for img, cat, iname, cname in zip(
                    warped, batch["category"], batch["im_name"],
                    batch["c_name"]):
                name = iname.replace(".jpg", "") + "_" + cname
                if (cat, name) in seen:  # pad_last duplicates
                    continue
                seen.add((cat, name))
                cat_dir = save_root / cat
                cat_dir.mkdir(parents=True, exist_ok=True)
                Image.fromarray(
                    (img * 255).round().astype(np.uint8)
                ).save(cat_dir / name, quality=95)

    size = (args.height, args.width)
    extract(_build(args, "train", "paired", size), "warped_cloths")
    extract(_build(args, "test", "paired", size), "warped_cloths")
    extract(_build(args, "test", "unpaired", size),
            "warped_cloths_unpaired")
    trackers.finish()
    logger.info("extraction complete")


if __name__ == "__main__":
    main()
