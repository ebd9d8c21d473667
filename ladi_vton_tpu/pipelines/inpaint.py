"""Plain Stable-Diffusion inpainting pipeline (9-channel UNet).

The reference validates the inversion adapter through diffusers'
*stock* StableDiffusionInpaintPipeline — no pose/cloth channels, no
EMASC (reference: src/train_inversion_adapter.py:546-572,
src/utils/image_from_pipe.py:139-218).  This is that engine on the
shared machinery: VAE encode -> 9ch concat -> DDIM scan -> decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
from ladi_vton_tpu.models.unet_condition import UNet2DCondition
from ladi_vton_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from ladi_vton_tpu.ops.resize import resize_nearest
from ladi_vton_tpu.pipelines.tryon import prepare_mask_and_masked_image


@dataclasses.dataclass(frozen=True)
class InpaintPipeline:
    unet: UNet2DCondition
    vae: AutoencoderKL
    scheduler: DDIMScheduler
    vae_scale_factor: int = 8

    def sample(
        self,
        params: dict[str, Any],
        *,
        image: jax.Array,
        mask_image: jax.Array,
        prompt_embeds: jax.Array,
        negative_prompt_embeds: jax.Array,
        rng: jax.Array,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, H, W, _ = image.shape
        lh, lw = H // self.vae_scale_factor, W // self.vae_scale_factor
        sf = self.vae.config.scaling_factor
        do_cfg = guidance_scale > 1.0

        rng_latents, rng_masked = jax.random.split(rng)
        mask, masked_image = prepare_mask_and_masked_image(image, mask_image)

        moments, _ = self.vae.apply(params["vae"], masked_image,
                                    method="encode")
        masked_latents = DiagonalGaussian(moments).sample(rng_masked) * sf
        mask_lat = resize_nearest(mask, (lh, lw))

        if latents is None:
            latents = jax.random.normal(rng_latents, (B, lh, lw, 4),
                                        jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma
        timesteps = self.scheduler.set_timesteps(num_inference_steps)

        if do_cfg:
            mask_in = jnp.concatenate([mask_lat] * 2)
            masked_in = jnp.concatenate([masked_latents] * 2)
            context = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
        else:
            mask_in, masked_in = mask_lat, masked_latents
            context = prompt_embeds

        def step(latents, t):
            lmi = jnp.concatenate([latents] * 2) if do_cfg else latents
            model_in = jnp.concatenate(
                [lmi, mask_in.astype(lmi.dtype),
                 masked_in.astype(lmi.dtype)], axis=-1)
            pred = self.unet.apply(
                params["unet"], model_in,
                jnp.broadcast_to(t, (model_in.shape[0],)), context)
            if do_cfg:
                uncond, text = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (text - uncond)
            return self.scheduler.step(pred, t, latents), None

        latents, _ = jax.lax.scan(step, latents, timesteps)
        decoded = self.vae.apply(params["vae"], latents / sf,
                                 method="decode")
        return jnp.clip(decoded.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)


def generate_images_inversion_adapter(
    pipe: InpaintPipeline,
    params,
    text_model,
    text_vars,
    tokenizer,
    inversion_adapter,
    adapter_vars,
    vision,
    vision_vars,
    loader,
    save_dir: str,
    *,
    num_vstar: int = 16,
    seed: int = 1234,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    use_png: bool = False,
):
    """Adapter-validation image dump through the plain inpaint pipeline
    (reference image_from_pipe.py:139-218)."""
    import numpy as np

    from ladi_vton_tpu.data.labels import CATEGORY_PROMPT_TEXT
    from ladi_vton_tpu.diffusion.text import encode_text_word_embedding
    from ladi_vton_tpu.ops.resize import resize_bilinear
    from ladi_vton_tpu.pipelines.drivers import _save_images

    root_key = jax.random.key(seed)
    empty_ids = jnp.asarray(tokenizer([""])[0])
    clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    all_params = {"pipe": params, "text": text_vars,
                  "adapter": adapter_vars, "vision": vision_vars}

    @jax.jit
    def run(ap, image, mask, cloth, input_ids, clip_feats, rng):
        if clip_feats is None:
            x = jnp.clip(resize_bilinear((cloth + 1) * 0.5, (224, 224)),
                         0, 1)
            clip_feats = vision.apply(ap["vision"],
                                      (x - clip_mean) / clip_std)
        ptes = inversion_adapter.apply(ap["adapter"], clip_feats)
        ehs, _ = encode_text_word_embedding(text_model, ap["text"],
                                            input_ids, ptes, num_vstar)
        neg, _ = text_model.apply(
            ap["text"], jnp.broadcast_to(empty_ids, input_ids.shape))
        return pipe.sample(ap["pipe"], image=image, mask_image=mask,
                           prompt_embeds=ehs, negative_prompt_embeds=neg,
                           rng=rng,
                           num_inference_steps=num_inference_steps,
                           guidance_scale=guidance_scale)

    from ladi_vton_tpu.pipelines.drivers import _PipelinedSaver, _quantize_u8

    saver = _PipelinedSaver(save_dir, use_png)
    for step, batch in enumerate(loader):
        prompts = [
            f'a photo of a model wearing {CATEGORY_PROMPT_TEXT[c]} '
            f'{" $ " * num_vstar}'
            for c in batch["category"]
        ]
        input_ids = jnp.asarray(tokenizer(prompts))
        feats = (jnp.asarray(batch["clip_cloth_features"])
                 if "clip_cloth_features" in batch else None)
        images = run(all_params, jnp.asarray(batch["image"]),
                     jnp.asarray(batch["inpaint_mask"]),
                     jnp.asarray(batch["cloth"]), input_ids, feats,
                     jax.random.fold_in(root_key, step))
        saver.push(_quantize_u8(images), batch["im_name"],
                   batch["category"])
    saver.flush()
