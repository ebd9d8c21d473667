"""Batch generation drivers (image_from_pipe equivalents).

Mirrors reference src/utils/image_from_pipe.py:
* ``generate_images_from_tryon_pipe`` (:26-136) — per-batch text/PTE
  assembly + try-on pipeline + per-category save.
* ``generate_images_inversion_adapter`` (:139-218) — adapter validation
  through the *plain* SD inpaint pipeline (no pose/cloth channels).
* ``extract_save_vae_images`` (:221-258) — VAE +/- EMASC reconstruction
  dumps.

All drivers jit one batch-shaped program and stream batches through it;
fetch+save of batch N overlaps batch N+1's device compute
(``_PipelinedSaver``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladi_vton_tpu.data.labels import CATEGORY_PROMPT_TEXT
from ladi_vton_tpu.diffusion.text import encode_text_word_embedding
from ladi_vton_tpu.models.emasc import mask_features
from ladi_vton_tpu.models.vae import DiagonalGaussian


@jax.jit
def _quantize_u8(images):
    """Quantize [0,1] float images to uint8 ON DEVICE — the fetch then
    moves 4x fewer bytes over PCIe (same rounding as the host path:
    round-half-to-even, matching np.round)."""
    x = jnp.clip(images.astype(jnp.float32), 0.0, 1.0)
    return jnp.round(x * 255.0).astype(jnp.uint8)


def _save_images(images: np.ndarray, names, categories, save_dir: str,
                 seen: set, use_png: bool = False):
    from PIL import Image

    for img, name, cat in zip(images, names, categories):
        if (cat, name) in seen:  # pad_last duplicates
            continue
        seen.add((cat, name))
        cat_dir = os.path.join(save_dir, cat)
        os.makedirs(cat_dir, exist_ok=True)
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (img * 255).round().astype(np.uint8)
        pil = Image.fromarray(img)
        if use_png:
            pil.save(os.path.join(cat_dir, name.replace(".jpg", ".png")))
        else:
            pil.save(os.path.join(cat_dir, name), quality=95)


class _PipelinedSaver:
    """One-batch software pipeline: defer the device→host fetch and the
    PIL encode of batch N until batch N+1's program has been DISPATCHED.

    jax dispatch is async, so while the device denoises batch N+1 the
    host fetches batch N's images (the transfer completes as soon as N's
    program finishes) and writes them to disk — the fetch+save cost
    disappears from the critical path instead of serializing every
    batch (reference loops save synchronously,
    src/utils/image_from_pipe.py:121-135).
    """

    def __init__(self, save_dir: str, use_png: bool = False):
        self.save_dir = save_dir
        self.use_png = use_png
        self.seen: set = set()
        self._pending = None

    def push(self, images, names, categories):
        """Queue batch N's (device) images; saves batch N-1's."""
        self.flush()
        self._pending = (images, list(names), list(categories))

    def flush(self):
        if self._pending is None:
            return
        images, names, cats = self._pending
        self._pending = None
        _save_images(np.asarray(images), names, cats, self.save_dir,
                     self.seen, self.use_png)


def generate_images_from_tryon_pipe(
    pipe,
    params,
    text_model,
    text_vars,
    tokenizer,
    loader,
    save_dir: str,
    *,
    inversion_adapter=None,
    adapter_vars=None,
    vision=None,
    vision_vars=None,
    text_usage: str = "inversion_adapter",
    num_vstar: int = 16,
    seed: int = 1234,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    use_png: bool = False,
    cloth_input_type: str = "warped",
    cloth_cond_rate: float = 1.0,
    no_pose: bool = False,
    mesh=None,
):
    """Generate try-on images for every batch in ``loader``.

    Expects batches with image/inpaint_mask/pose_map/warped_cloth
    (+cloth or clip_cloth_features for adapter mode) + im_name/category.

    ``mesh``: optional ``jax.sharding.Mesh`` — batches shard over its
    ``data`` axis and each chip denoises its slice (the reference's
    accelerate DDP eval, src/inference.py:223).  Batch sizes must be
    divisible by the data-axis size (use BatchLoader(pad_last=True)).
    """
    os.makedirs(save_dir, exist_ok=True)
    root_key = jax.random.key(seed)
    empty_ids = jnp.asarray(tokenizer([""])[0])

    if mesh is not None:
        from ladi_vton_tpu.parallel.sharding import eval_placement

        put_repl, put_data = eval_placement(mesh)
    else:
        put_repl = put_data = lambda tree: tree

    clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    # weight trees as jit ARGUMENTS (closures would bake GBs of constants)
    text_cond_params = put_repl({"text": text_vars, "adapter": adapter_vars})
    params = put_repl(params)
    vision_vars = put_repl(vision_vars) if vision_vars is not None else None

    @jax.jit
    def encode_text(tp, input_ids, clip_feats):
        if text_usage == "inversion_adapter":
            ptes = inversion_adapter.apply(tp["adapter"], clip_feats)
            ehs, _ = encode_text_word_embedding(
                text_model, tp["text"], input_ids, ptes, num_vstar)
        else:
            ehs, _ = text_model.apply(tp["text"], input_ids)
        uncond_ids = jnp.broadcast_to(empty_ids, input_ids.shape)
        neg_ehs, _ = text_model.apply(tp["text"], uncond_ids)
        return ehs, neg_ehs

    sampler = pipe.jit_sample(
        split=True, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, cloth_cond_rate=cloth_cond_rate,
        no_pose=no_pose)

    def run(image, mask, pose, warped, input_ids, clip_feats, rng):
        ehs, neg_ehs = encode_text(text_cond_params, input_ids, clip_feats)
        return sampler(
            params, image, mask, pose,
            warped if cloth_input_type == "warped" else None,
            ehs, neg_ehs, rng)

    @jax.jit
    def vision_feats(vv, cloth):
        from ladi_vton_tpu.ops.resize import resize_bilinear

        x = jnp.clip(resize_bilinear((cloth + 1.0) * 0.5, (224, 224)),
                     0.0, 1.0)
        x = (x - clip_mean) / clip_std
        return vision.apply(vv, x)

    saver = _PipelinedSaver(save_dir, use_png)
    for step, batch in enumerate(loader):
        if text_usage == "inversion_adapter":
            if "clip_cloth_features" in batch:
                clip_feats = jnp.asarray(batch["clip_cloth_features"])
            else:
                clip_feats = vision_feats(vision_vars,
                                          jnp.asarray(batch["cloth"]))
            prompts = [
                f'a photo of a model wearing '
                f'{CATEGORY_PROMPT_TEXT[c]} {" $ " * num_vstar}'
                for c in batch["category"]
            ]
        elif text_usage == "noun_chunks":
            clip_feats = jnp.zeros((len(batch["im_name"]), 1, 1))
            prompts = batch["captions"]
        else:
            clip_feats = jnp.zeros((len(batch["im_name"]), 1, 1))
            prompts = [""] * len(batch["im_name"])
        input_ids = jnp.asarray(tokenizer(prompts))
        rng = jax.random.fold_in(root_key, step)
        arrays = put_data({
            "image": jnp.asarray(batch["image"]),
            "mask": jnp.asarray(batch["inpaint_mask"]),
            "pose": jnp.asarray(batch["pose_map"]),
            "warped": jnp.asarray(batch.get(
                "warped_cloth", batch["image"])),
            "input_ids": input_ids,
            "clip_feats": clip_feats,
        })
        images = run(arrays["image"], arrays["mask"], arrays["pose"],
                     arrays["warped"], arrays["input_ids"],
                     arrays["clip_feats"], rng)
        saver.push(_quantize_u8(images), batch["im_name"],
                   batch["category"])
    saver.flush()


def extract_save_vae_images(
    vae,
    vae_vars,
    emasc,
    emasc_vars,
    loader,
    save_dir: str,
    *,
    int_layers=(1, 2, 3, 4, 5),
    seed: int = 0,
):
    """VAE (+EMASC) reconstruction dumps
    (reference image_from_pipe.py:221-258)."""
    os.makedirs(save_dir, exist_ok=True)
    root_key = jax.random.key(seed)

    # weight trees as jit ARGUMENTS (closures would bake the VAE into
    # the program as constants)
    recon_params = {"vae": vae_vars, "emasc": emasc_vars}

    @jax.jit
    def recon(rp, image, im_mask, inpaint_mask, rng):
        moments, _ = vae.apply(rp["vae"], image, method="encode")
        latents = DiagonalGaussian(moments).sample(rng)
        _, feats = vae.apply(rp["vae"], im_mask, method="encode")
        sel = [feats[i] for i in int_layers]
        adapted = emasc.apply(rp["emasc"], sel)
        adapted = mask_features(adapted, inpaint_mask)
        out = vae.apply(rp["vae"], latents, adapted, tuple(int_layers),
                        method="decode")
        return jnp.clip(out.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    saver = _PipelinedSaver(save_dir)
    for step, batch in enumerate(loader):
        rng = jax.random.fold_in(root_key, step)
        images = recon(recon_params, jnp.asarray(batch["image"]),
                       jnp.asarray(batch["im_mask"]),
                       jnp.asarray(batch["inpaint_mask"]), rng)
        saver.push(_quantize_u8(images), batch["im_name"],
                   batch["category"])
    saver.flush()
