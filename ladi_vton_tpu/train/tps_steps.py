"""Training steps for stage-1 warping (TPS + refinement) and the
inversion-adapter pretraining stage.

Mirrors the reference's loops as pure jitted steps:

* phase A — TPS at 256x192: L1(grid-sampled cloth, im_cloth) +
  const_weight * mean(rx+ry+cx+cy+rg+cg), Adam(0.5, 0.99)
  (reference: src/train_tps.py:95-144,393-395).
* phase B — refinement at 512x384: TPS frozen, grid bilinearly
  upsampled, warped cloth + masked person + pose through UNetVanilla,
  l1_weight * L1 + vgg_weight * VGG (reference: src/train_tps.py:
  147-220).
* warp extraction — the deterministic warp+refine forward used both by
  the extraction job that materializes ``data/warped_cloths*`` and by
  inference (reference: src/train_tps.py:223-280, src/inference.py:
  239-266).
* inversion adapter — stock 9-channel SD inpaint UNet, MSE on noise,
  only the adapter trains (reference: src/train_inversion_adapter.py:
  443-515).

BatchNorm batch statistics are carried in the train state and updated
per step (the torch reference trains BN unsynced per replica; under the
mesh the stats here are computed per global batch — strictly better).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
from ladi_vton_tpu.diffusion.text import splice_word_embeddings
from ladi_vton_tpu.ops.grid_sample import grid_sample
from ladi_vton_tpu.ops.resize import resize_bilinear


class MutableTrainState(struct.PyTreeNode):
    """Train state that also carries non-param variables (batch_stats)."""

    step: jax.Array
    params: Any
    extra: Any  # e.g. {'batch_stats': ...}
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: dict, tx):
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   extra=extra, opt_state=tx.init(params), tx=tx)

    @property
    def variables(self) -> dict:
        return {"params": self.params, **self.extra}

    def apply_gradients(self, grads, new_extra=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            extra=new_extra if new_extra is not None else self.extra,
            opt_state=new_opt,
        )


def tps_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    """Adam betas (0.5, 0.99) like the reference (train_tps.py:393-395)."""
    return optax.adam(lr, b1=0.5, b2=0.99)


def make_tps_train_step(*, tps, const_weight: float = 0.01) -> Callable:
    """Phase A step. batch: cloth/im_cloth/im_mask (B,256,192,3) and
    pose (B,256,192,18) or dense_uv."""

    def loss_fn(params, extra, batch):
        agnostic = jnp.concatenate([batch["im_mask"], batch["pose"]],
                                   axis=-1)
        (grid, theta, rx, ry, cx, cy, rg, cg), new_vars = tps.apply(
            {"params": params, **extra}, batch["cloth"], agnostic,
            train=True, mutable=["batch_stats"])
        warped = grid_sample(batch["cloth"], grid, padding_mode="border")
        l1 = jnp.mean(jnp.abs(warped - batch["im_cloth"]))
        const = jnp.mean(rx + ry + cx + cy + rg + cg)
        loss = l1 + const * const_weight
        return loss, (l1, const, new_vars)

    def step(state: MutableTrainState, batch):
        (loss, (l1, const, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra, batch)
        state = state.apply_gradients(grads, new_extra=dict(new_vars))
        return state, {"loss": loss, "l1": l1, "const": const}

    return step


def make_refinement_train_step(*, tps, refinement, vgg,
                               l1_weight: float = 1.0,
                               vgg_weight: float = 0.25,
                               height: int = 512,
                               width: int = 384) -> Callable:
    """Phase B step. batch at full res; TPS applied frozen at 256x192."""
    from ladi_vton_tpu.models.vgg import vgg_loss

    def warp(frozen_tps_vars, batch):
        low_cloth = resize_bilinear(batch["cloth"], (256, 192))
        low_mask = resize_bilinear(batch["im_mask"], (256, 192))
        low_pose = resize_bilinear(batch["pose"], (256, 192))
        agnostic = jnp.concatenate([low_mask, low_pose], axis=-1)
        grid, *_ = tps.apply(frozen_tps_vars, low_cloth, agnostic)
        grid_hr = resize_bilinear(grid, (height, width))
        return grid_sample(batch["cloth"], grid_hr, padding_mode="border")

    def loss_fn(params, extra, frozen, batch):
        warped = warp(frozen["tps"], batch)
        ref_in = jnp.concatenate(
            [batch["im_mask"], batch["pose"], warped], axis=-1)
        refined, new_vars = refinement.apply(
            {"params": params, **extra}, ref_in, train=True,
            mutable=["batch_stats"])
        l1 = jnp.mean(jnp.abs(refined - batch["im_cloth"]))
        perc = vgg_loss(vgg, frozen["vgg"], refined, batch["im_cloth"])
        loss = l1 * l1_weight + perc * vgg_weight
        return loss, (l1, perc, new_vars)

    def step(state: MutableTrainState, frozen, batch):
        (loss, (l1, perc, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra, frozen, batch)
        state = state.apply_gradients(grads, new_extra=dict(new_vars))
        return state, {"loss": loss, "l1": l1, "vgg": perc}

    return step


def warp_and_refine(tps, tps_vars, refinement, ref_vars, *,
                    cloth, im_mask, pose, height: int = 512,
                    width: int = 384, clamp: bool = True) -> jax.Array:
    """Deterministic warp+refine forward (extraction / inference path).

    Returns the refined warped cloth in [-1, 1]
    (reference src/train_tps.py:244-273, src/inference.py:242-266).
    """
    low_cloth = resize_bilinear(cloth, (256, 192)).astype(jnp.float32)
    low_mask = resize_bilinear(im_mask, (256, 192)).astype(jnp.float32)
    low_pose = resize_bilinear(pose, (256, 192)).astype(jnp.float32)
    agnostic = jnp.concatenate([low_mask, low_pose], axis=-1)
    grid, *_ = tps.apply(tps_vars, low_cloth, agnostic)
    grid_hr = resize_bilinear(grid, (height, width))
    warped = grid_sample(cloth.astype(jnp.float32), grid_hr,
                         padding_mode="border")
    ref_in = jnp.concatenate(
        [im_mask.astype(jnp.float32), pose.astype(jnp.float32), warped],
        axis=-1)
    refined = refinement.apply(ref_vars, ref_in)
    return jnp.clip(refined, -1.0, 1.0) if clamp else refined


def make_inversion_adapter_train_step(
    *,
    unet9,
    vae,
    text_model,
    inversion_adapter,
    noise_scheduler: DDPMScheduler,
    num_vstar: int = 16,
    num_train_timesteps: int = 1000,
    gradient_accumulation_steps: int = 1,
) -> Callable:
    """Stage-3 step: train only the adapter through the frozen stock
    inpaint UNet (reference src/train_inversion_adapter.py:443-515).

    batch: image, im_mask, inpaint_mask, input_ids,
    clip_cloth_features."""
    from ladi_vton_tpu.models.vae import DiagonalGaussian
    from ladi_vton_tpu.ops.resize import resize_nearest

    def loss_fn(trainable, frozen, batch, rng):
        rngs = jax.random.split(rng, 4)
        image = batch["image"]
        B, H, W, _ = image.shape
        lh, lw = H // 8, W // 8
        sf = vae.config.scaling_factor

        moments, _ = vae.apply(frozen["vae"], image, method="encode")
        latents = DiagonalGaussian(moments).sample(rngs[0]) * sf
        noise = jax.random.normal(rngs[1], latents.shape, latents.dtype)
        timesteps = jax.random.randint(rngs[2], (B,), 0,
                                       num_train_timesteps)
        noisy = noise_scheduler.add_noise(latents, noise, timesteps)

        mask = resize_nearest(batch["inpaint_mask"], (lh, lw))
        m_moments, _ = vae.apply(frozen["vae"], batch["im_mask"],
                                 method="encode")
        masked_latents = DiagonalGaussian(m_moments).sample(rngs[3]) * sf

        ptes = inversion_adapter.apply(trainable["adapter"],
                                       batch["clip_cloth_features"])
        embeds = text_model.apply(frozen["text"], batch["input_ids"],
                                  method="embed")
        embeds = splice_word_embeddings(
            embeds, batch["input_ids"],
            ptes.reshape(B, num_vstar, -1), num_vstar)
        ehs, _ = text_model.apply(frozen["text"], embeds,
                                  batch["input_ids"],
                                  method="forward_embeds")

        unet_in = jnp.concatenate(
            [noisy, mask.astype(noisy.dtype), masked_latents], axis=-1)
        pred = unet9.apply(frozen["unet"], unet_in, timesteps, ehs)
        return jnp.mean(jnp.square(
            pred.astype(jnp.float32) - noise.astype(jnp.float32)))

    from ladi_vton_tpu.train.steps import build_train_step

    return build_train_step(
        lambda p, f, b, r: (loss_fn(p, f, b, r), {}),
        gradient_accumulation_steps)
