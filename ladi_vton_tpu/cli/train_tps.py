"""Stage-1 training CLI: TPS warping + refinement, and warped-cloth
extraction.

Flag surface mirrors reference src/train_tps.py:283-312 (argparse) and
README.md "Train the warping module".  Mechanics mirrored:

* Phase A — TPS at 256x192 (the reference mutates dataset height/width
  in place, :450-451; here two dataset configs): L1 + const_weight *
  constraint sum, Adam(0.5, 0.99), epoch checkpoints in one rolling
  bundle (:509-515).
* Phase B — refinement at 512x384 (:521-536): L1 * l1_weight + VGG *
  vgg_weight.
* ``--only_extraction`` early path (:416-441) and the final extraction
  of warped cloths for train+test paired and test unpaired into
  ``<cache>/warped_cloths{,_unpaired}/<dataset>/<category>/`` —
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
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--const_weight", type=float, default=0.01)
    p.add_argument("--l1_weight", type=float, default=1.0)
    p.add_argument("--vgg_weight", type=float, default=0.25)
    p.add_argument("--epochs_tps", type=int, default=50)
    p.add_argument("--epochs_refinement", type=int, default=50)
    p.add_argument("--dense", action="store_true",
                   help="use dense UV pose instead of keypoint heatmaps")
    p.add_argument("--only_extraction", action="store_true")
    p.add_argument("--vgg_weights", type=str, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--report_to", type=str, default="wandb")
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
    from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh
    from ladi_vton_tpu.data.loader import BatchLoader
    from ladi_vton_tpu.hub import convert as Cv
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.models.refinement import UNetVanilla
    from ladi_vton_tpu.models.tps import ConvNetTPS
    from ladi_vton_tpu.models.vgg import VGG19Features
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
    try:
        tps_state, ref_state = ckpt.restore((tps_state, ref_state))
        logger.info("resumed warping checkpoint")
        resumed = True
    except FileNotFoundError:
        resumed = False

    trackers = Trackers(args.report_to, "LaDI_VTON_tps", str(out_dir),
                        vars(args))
    mesh = make_mesh(MeshSpec())

    def collate_pose(batch):
        pose = batch[_pose_key(args)]
        if args.dense and pose.shape[-1] != 2:
            pose = np.transpose(pose, (0, 2, 3, 1))  # CHW -> HWC
        return pose

    if not (args.only_extraction or resumed):
        # ---------------- phase A: TPS at 256x192
        low_train = _build(args, "train", "paired", (256, 192))
        loader = BatchLoader(low_train, args.batch_size, shuffle=True,
                             num_workers=args.workers, drop_last=True,
                             seed=args.seed)
        step_a = jax.jit(make_tps_train_step(
            tps=tps, const_weight=args.const_weight))
        for epoch in range(args.epochs_tps):
            losses = []
            for batch in loader:
                arrays = {
                    "cloth": jnp.asarray(batch["cloth"]),
                    "im_cloth": jnp.asarray(batch["im_cloth"]),
                    "im_mask": jnp.asarray(batch["im_mask"]),
                    "pose": jnp.asarray(collate_pose(batch)),
                }
                tps_state, metrics = step_a(tps_state, arrays)
                losses.append(float(metrics["loss"]))
            logger.info(f"tps epoch {epoch}: loss={np.mean(losses):.4f}")
            trackers.log({"tps/loss": float(np.mean(losses))}, epoch)
            ckpt.save(epoch, (tps_state, ref_state))

        # ---------------- phase B: refinement at full res
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
        for epoch in range(args.epochs_refinement):
            losses = []
            for batch in loader:
                arrays = {
                    "cloth": jnp.asarray(batch["cloth"]),
                    "im_cloth": jnp.asarray(batch["im_cloth"]),
                    "im_mask": jnp.asarray(batch["im_mask"]),
                    "pose": jnp.asarray(collate_pose(batch)),
                }
                ref_state, metrics = step_b(ref_state, frozen, arrays)
                losses.append(float(metrics["loss"]))
            logger.info(
                f"refinement epoch {epoch}: loss={np.mean(losses):.4f}")
            trackers.log({"refinement/loss": float(np.mean(losses))},
                         args.epochs_tps + epoch)
            ckpt.save(args.epochs_tps + epoch, (tps_state, ref_state))

    # ---------------- extraction (reference :590-614)
    from PIL import Image

    cache_root = Path(
        args.dresscode_dataroot or args.vitonhd_dataroot).parent / "cache"

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
                if name in seen:
                    continue
                seen.add(name)
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
