"""Conditioning stage: TPS warp → refinement → CLIP vision/PTE text.

Factored from the flagship inference flow so the batch CLI
(``cli.inference``) and the serving endpoint (``cli.serve
--enable_condition``) compile the SAME program.  Mirrors reference
``src/inference.py:242-295``: low-res TPS warp of the in-shop cloth,
full-res ``grid_sample``, UNet refinement, CLIP-ViT-H vision features →
inversion-adapter PTEs → PTE-injected text encoding, plus the
unconditional embeddings.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ladi_vton_tpu.diffusion.text import encode_text_word_embedding
from ladi_vton_tpu.ops.grid_sample import grid_sample
from ladi_vton_tpu.ops.resize import resize_bilinear

# openai CLIP preprocessing constants
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def build_condition_fn(
    *,
    tps,
    refinement,
    vision,
    adapter,
    text_model,
    num_vstar: int,
    dtype,
    empty_ids: jax.Array,
    image_size: tuple = (512, 384),
    tps_size: tuple = (256, 192),
) -> Callable:
    """Build the jitted conditioning program.

    Returns ``condition(cond_params, pose_map, cloth, im_mask,
    input_ids) -> (warped_cloth, prompt_embeds,
    negative_prompt_embeds)`` where ``cond_params`` is a dict with
    ``tps`` / ``ref`` / ``vision`` / ``adapter`` / ``text`` weight
    trees (passed as jit ARGUMENTS — closing over them would bake
    gigabytes of constants into the program).
    """
    clip_mean = jnp.asarray(CLIP_MEAN, dtype)
    clip_std = jnp.asarray(CLIP_STD, dtype)

    @jax.jit
    def condition(cp, pose_map, cloth, im_mask, input_ids):
        tps_vars, ref_vars = cp["tps"], cp["ref"]
        vision_vars, adapter_vars = cp["vision"], cp["adapter"]
        text_vars = cp["text"]
        # 1. TPS warp at low res (reference src/inference.py:242-260)
        low_cloth = resize_bilinear(cloth, tps_size).astype(jnp.float32)
        low_mask = resize_bilinear(im_mask, tps_size).astype(jnp.float32)
        low_pose = resize_bilinear(pose_map, tps_size).astype(jnp.float32)
        agnostic = jnp.concatenate([low_mask, low_pose], axis=-1)
        low_grid, *_ = tps.apply(tps_vars, low_cloth, agnostic)
        grid = resize_bilinear(low_grid, image_size)
        warped = grid_sample(cloth.astype(jnp.float32), grid,
                             padding_mode="border")
        # 2. refinement (reference :263-266)
        ref_in = jnp.concatenate(
            [im_mask.astype(jnp.float32), pose_map.astype(jnp.float32),
             warped], axis=-1)
        warped = refinement.apply(ref_vars, ref_in)
        warped = jnp.clip(warped, -1.0, 1.0).astype(dtype)
        # 3. CLIP vision -> PTEs (reference :269-277)
        clip_in = resize_bilinear((cloth + 1.0) * 0.5, (224, 224))
        clip_in = jnp.clip(clip_in, 0.0, 1.0)
        clip_in = ((clip_in - clip_mean) / clip_std).astype(dtype)
        vis_feats = vision.apply(vision_vars, clip_in)
        ptes = adapter.apply(adapter_vars, vis_feats)
        # 4. PTE-injected text encoding (reference :294-295)
        ehs, _ = encode_text_word_embedding(text_model, text_vars,
                                            input_ids, ptes, num_vstar)
        uncond_ids = jnp.broadcast_to(empty_ids, input_ids.shape)
        neg_ehs, _ = text_model.apply(text_vars, uncond_ids)
        return warped, ehs, neg_ehs

    return condition
