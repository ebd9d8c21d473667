"""The try-on engine: latent-diffusion inpainting conditioned on pose,
warped garment and pseudo-word text embeddings.

TPU-native re-design of the reference's StableDiffusionTryOnePipeline
(reference: src/vto_pipelines/tryon_pipe.py:494-765).  Differences are
architectural, not behavioral:

* the entire generation — VAE encodes, EMASC adapters, 50-step DDIM
  denoise, EMASC-aware decode — is ONE jitted function; the denoise loop
  is a ``lax.scan`` so XLA compiles a single program with no host
  round-trips (the torch original re-dispatches every step),
* classifier-free guidance runs as a batched 2B forward (uncond halves
  of pose/cloth zeroed, reference :702-705), and the step-indexed
  warped-cloth gate (reference :717-719) is a ``jnp.where`` on the scan
  counter,
* images stay NHWC end-to-end; the only host transfer is the final
  decoded batch.

Semantics preserved from the reference:
* mask binarization + masked image (diffusers prepare_mask_and_masked_image)
* nearest-resize of the mask to latent resolution (:434-436)
* VAE latents *sampled* (not mode) and scaled by 0.18215 (:458-462, 640-647)
* pose map bilinearly downsampled 8x (:632-634)
* EMASC features gated by (1 - full-res mask) before decode (:684-685)
* CFG combine uncond + g*(text - uncond) (:735-737)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from ladi_vton_tpu.models.emasc import EMASC, mask_features
from ladi_vton_tpu.models.unet_condition import UNet2DCondition
from ladi_vton_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from ladi_vton_tpu.ops.resize import resize_bilinear, resize_nearest


def prepare_mask_and_masked_image(image: jax.Array, mask: jax.Array):
    """Binarize mask and zero the to-be-inpainted region of the image.

    ``image`` in [-1, 1] NHWC; ``mask`` (B, H, W, 1) in [0, 1].
    Matches diffusers' helper used at reference tryon_pipe.py:630.
    """
    mask = (mask >= 0.5).astype(image.dtype)
    masked_image = image * (mask < 0.5)
    return mask, masked_image


def cloth_gate_start(num_inference_steps: int,
                     cloth_cond_rate: float) -> float:
    """First denoise-loop index at which warped-cloth conditioning is
    zeroed.

    The reference gates at ``i >= num_inference_steps -
    (1 - rate) * num_inference_steps`` = ``rate * num_inference_steps``
    (tryon_pipe.py:654,717-719).  It must be computed from
    ``num_inference_steps``, NOT the timestep-plan length: PNDM plans
    are ``num_inference_steps + 1`` entries long, which would shift the
    boundary by one step (ADVICE r2).
    """
    return cloth_cond_rate * num_inference_steps


@dataclasses.dataclass(frozen=True)
class TryOnPipeline:
    """Bundles the model defs; parameters travel separately (functional).

    ``scheduler`` accepts the reference's full union — DDIM, PNDM or
    LMS (reference tryon_pipe.py scheduler type hints) — plus the
    beyond-reference DPM-Solver++(2M), via the uniform
    ``init_loop_state / scale_input / loop_step`` protocol.
    """

    unet: UNet2DCondition
    vae: AutoencoderKL
    scheduler: Any  # DDIM | PNDM | LMS | DPMSolverMultistep
    emasc: Optional[EMASC] = None
    emasc_int_layers: Sequence[int] = (1, 2, 3, 4, 5)
    vae_scale_factor: int = 8
    # Hoist the 32 loop-invariant cross-attn context projections out of
    # the denoise scan (identical numbers — precompute_context_kv).
    # Measured LOSS on TPU (tools/perf.py kv-hoist-ab, docs/PERF.md
    # §11a): XLA's while-loop LICM already hoists these dots, and the
    # explicit-KV branch forfeits the bhsd folded projections.  Keep
    # off; the flag remains for the parity tests / the record.
    hoist_context_kv: bool = False

    def sample(
        self,
        params: dict[str, Any],
        *,
        image: jax.Array,
        mask_image: jax.Array,
        pose_map: jax.Array,
        prompt_embeds: jax.Array,
        negative_prompt_embeds: jax.Array,
        rng: jax.Array,
        warped_cloth: Optional[jax.Array] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        cloth_cond_rate: float = 1.0,
        no_pose: bool = False,
        latents: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Generate try-on images. Returns float32 NHWC in [0, 1].

        image: (B,H,W,3) in [-1,1]; mask_image: (B,H,W,1) 1=inpaint;
        pose_map: (B,H,W,18); warped_cloth: (B,H,W,3) in [-1,1] or None
        (the reference's ``cloth_input_type='none'``); prompt embeds:
        (B,77,D).
        """
        prepared = self.prepare(params, image=image, mask_image=mask_image,
                                pose_map=pose_map,
                                warped_cloth=warped_cloth, rng=rng,
                                no_pose=no_pose)
        if latents is not None:
            prepared["latents"] = latents
        intermediate = prepared.pop("intermediate")
        latents = self.denoise(
            params, prepared, prompt_embeds=prompt_embeds,
            negative_prompt_embeds=negative_prompt_embeds,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            cloth_cond_rate=cloth_cond_rate)
        return self.decode(params, latents, intermediate)

    # ------------------------------------------------------------------
    # split-program variant: identical math, three modest XLA programs
    # (prep / denoise-scan / decode) instead of one monolith.  Useful
    # where compile latency of the fused program is prohibitive (remote
    # compile services); the per-batch cost is two extra dispatches.

    def prepare(self, params, *, image, mask_image, pose_map,
                warped_cloth, rng, no_pose: bool = False):
        B, H, W, _ = image.shape
        lh, lw = H // self.vae_scale_factor, W // self.vae_scale_factor
        sf = self.vae.config.scaling_factor
        rng_latents, rng_masked, rng_cloth = jax.random.split(rng, 3)

        mask, masked_image = prepare_mask_and_masked_image(image, mask_image)
        pose_lat = resize_bilinear(pose_map, (lh, lw))
        if no_pose:
            pose_lat = jnp.zeros_like(pose_lat)

        if warped_cloth is not None:
            # one batched encoder pass for cloth + masked image (the
            # encoder weights stream from HBM once; feature taps are
            # free captures, so the cloth half's are simply unused)
            both = jnp.concatenate(
                [warped_cloth.astype(masked_image.dtype), masked_image])
            moments2, feats2 = self.vae.apply(params["vae"], both,
                                              method="encode")
            cloth_moments, moments = jnp.split(moments2, 2, axis=0)
            feats = [f[B:] for f in feats2]
            cloth_latents = (DiagonalGaussian(cloth_moments)
                             .sample(rng_cloth) * sf)
        else:
            cloth_latents = None
            moments, feats = self.vae.apply(params["vae"], masked_image,
                                            method="encode")
        masked_latents = DiagonalGaussian(moments).sample(rng_masked) * sf
        mask_lat = resize_nearest(mask, (lh, lw))

        intermediate = None
        if self.emasc is not None:
            selected = [feats[i] for i in self.emasc_int_layers]
            adapted = self.emasc.apply(params["emasc"], selected)
            intermediate = mask_features(adapted, mask_image)

        # raw N(0,1) here; denoise scales by the scheduler's
        # init_noise_sigma (which for LMS is only known per plan)
        latents = jax.random.normal(rng_latents, (B, lh, lw, 4),
                                    jnp.float32)
        return {
            "latents": latents,
            "mask_lat": mask_lat,
            "masked_latents": masked_latents,
            "pose_lat": pose_lat,
            "cloth_latents": cloth_latents,
            "intermediate": intermediate,
        }

    def _cfg_inputs(self, prepared, prompt_embeds, negative_prompt_embeds,
                    do_cfg: bool):
        mask_lat = prepared["mask_lat"]
        masked_latents = prepared["masked_latents"]
        pose_lat = prepared["pose_lat"]
        cloth_latents = prepared["cloth_latents"]
        if do_cfg:
            mask_in = jnp.concatenate([mask_lat] * 2)
            masked_in = jnp.concatenate([masked_latents] * 2)
            pose_in = jnp.concatenate([jnp.zeros_like(pose_lat), pose_lat])
            context = jnp.concatenate([negative_prompt_embeds,
                                       prompt_embeds])
            cloth_in = (jnp.concatenate([jnp.zeros_like(cloth_latents),
                                         cloth_latents])
                        if cloth_latents is not None else None)
        else:
            mask_in, masked_in, pose_in = mask_lat, masked_latents, pose_lat
            context = prompt_embeds
            cloth_in = cloth_latents
        return mask_in, masked_in, pose_in, cloth_in, context

    def denoise_one_step(self, params, latents, sched_state, step_i, t, *,
                         mask_in, masked_in, pose_in, cloth_in, context,
                         guidance_scale: float, cloth_gate_from: float,
                         context_kv=None):
        """A single denoise update — the unit of the host-driven loop.

        Returns (new_latents, new_scheduler_state).  ``scale_input`` /
        ``loop_step`` is the uniform protocol all three schedulers
        (DDIM | PNDM | LMS — the reference pipeline's scheduler union,
        tryon_pipe.py type hints) implement, so the same scan body
        serves any of them (scale_model_input: tryon_pipe.py:722).
        """
        do_cfg = guidance_scale > 1.0
        scaled = self.scheduler.scale_input(latents, step_i, t)
        lmi = jnp.concatenate([scaled] * 2) if do_cfg else scaled
        parts = [lmi, mask_in.astype(lmi.dtype),
                 masked_in.astype(lmi.dtype), pose_in.astype(lmi.dtype)]
        if cloth_in is not None:
            gated = jnp.where(step_i >= cloth_gate_from,
                              jnp.zeros_like(cloth_in), cloth_in)
            parts.append(gated.astype(lmi.dtype))
        model_in = jnp.concatenate(parts, axis=-1)
        # kwarg only when hoisting is on: stub/alternate UNets need not
        # know about context_kv
        kv_kw = {} if context_kv is None else {"context_kv": context_kv}
        noise_pred = self.unet.apply(
            params["unet"], model_in,
            jnp.broadcast_to(t, (model_in.shape[0],)), context, **kv_kw)
        if do_cfg:
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + guidance_scale * (text - uncond)
        sched_state, latents = self.scheduler.loop_step(
            sched_state, noise_pred, step_i, t, latents)
        return latents, sched_state

    def denoise(self, params, prepared, *, prompt_embeds,
                negative_prompt_embeds, num_inference_steps: int = 50,
                guidance_scale: float = 7.5,
                cloth_cond_rate: float = 1.0):
        do_cfg = guidance_scale > 1.0
        timesteps = self.scheduler.set_timesteps(num_inference_steps)
        latents = prepared["latents"] * self.scheduler.init_noise_sigma
        n_loop = int(timesteps.shape[0])  # PNDM plans are n+1 long
        cloth_gate_from = cloth_gate_start(num_inference_steps,
                                           cloth_cond_rate)
        mask_in, masked_in, pose_in, cloth_in, context = self._cfg_inputs(
            prepared, prompt_embeds, negative_prompt_embeds, do_cfg)
        context_kv = None
        if self.hoist_context_kv:
            from ladi_vton_tpu.models.unet_condition import (
                precompute_context_kv,
            )

            context_kv = precompute_context_kv(
                params["unet"], context, self.unet.config, self.unet.dtype)

        def denoise_step(carry, step):
            latents, sched_state = carry
            i, t = step
            return self.denoise_one_step(
                params, latents, sched_state, i, t, mask_in=mask_in,
                masked_in=masked_in, pose_in=pose_in, cloth_in=cloth_in,
                context=context, guidance_scale=guidance_scale,
                cloth_gate_from=cloth_gate_from,
                context_kv=context_kv), None

        steps = (jnp.arange(n_loop), timesteps)
        carry0 = (latents, self.scheduler.init_loop_state(latents))
        (latents, _), _ = jax.lax.scan(denoise_step, carry0, steps)
        return latents

    def decode(self, params, latents, intermediate=None):
        z = latents / self.vae.config.scaling_factor
        if self.emasc is not None and intermediate is not None:
            decoded = self.vae.apply(params["vae"], z, intermediate,
                                     tuple(self.emasc_int_layers),
                                     method="decode")
        else:
            decoded = self.vae.apply(params["vae"], z, method="decode")
        return jnp.clip(decoded.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def jit_sample(self, split: bool = False, **static_kwargs):
        """A jitted sampler with the static config baked in.

        ``split=True`` compiles prep/denoise/decode as three programs —
        identical numerics, far smaller compile units.
        """
        if not split:
            fn = functools.partial(
                self.sample, **{k: v for k, v in static_kwargs.items()
                                if k != "denoise_mode"})

            @jax.jit
            def sampler(params, image, mask_image, pose_map, warped_cloth,
                        prompt_embeds, negative_prompt_embeds, rng):
                return fn(
                    params,
                    image=image,
                    mask_image=mask_image,
                    pose_map=pose_map,
                    warped_cloth=warped_cloth,
                    prompt_embeds=prompt_embeds,
                    negative_prompt_embeds=negative_prompt_embeds,
                    rng=rng,
                )

            return sampler

        gen_keys = ("num_inference_steps", "guidance_scale",
                    "cloth_cond_rate")
        prep_kwargs = {k: v for k, v in static_kwargs.items()
                       if k == "no_pose"}
        den_kwargs = {k: v for k, v in static_kwargs.items()
                      if k in gen_keys}
        denoise_mode = static_kwargs.get("denoise_mode", "scan")

        prep = jax.jit(functools.partial(self.prepare, **prep_kwargs))
        dec = jax.jit(self.decode)

        if denoise_mode == "scan":
            den = jax.jit(functools.partial(self.denoise, **den_kwargs))
        else:
            # host-driven loop: one compiled step, N dispatches — for
            # environments where compiling the scan program is
            # impractical; numerics identical.
            n_steps = den_kwargs.get("num_inference_steps", 50)
            g = den_kwargs.get("guidance_scale", 7.5)
            rate = den_kwargs.get("cloth_cond_rate", 1.0)
            timesteps = self.scheduler.set_timesteps(n_steps)
            host_ts = [int(t) for t in timesteps]
            # from num_inference_steps, NOT plan length (PNDM plans are
            # n+1 long — see cloth_gate_start)
            gate = cloth_gate_start(n_steps, rate)
            step_fn = jax.jit(functools.partial(
                self.denoise_one_step, guidance_scale=g,
                cloth_gate_from=gate))

            def den(params, prepared, *, prompt_embeds,
                    negative_prompt_embeds):
                mask_in, masked_in, pose_in, cloth_in, context = (
                    self._cfg_inputs(prepared, prompt_embeds,
                                     negative_prompt_embeds, g > 1.0))
                latents = (prepared["latents"]
                           * self.scheduler.init_noise_sigma)
                sched_state = self.scheduler.init_loop_state(latents)
                for i, t in enumerate(host_ts):
                    latents, sched_state = step_fn(
                        params, latents, sched_state, jnp.asarray(i),
                        jnp.asarray(t), mask_in=mask_in,
                        masked_in=masked_in, pose_in=pose_in,
                        cloth_in=cloth_in, context=context)
                return latents

        def sampler(params, image, mask_image, pose_map, warped_cloth,
                    prompt_embeds, negative_prompt_embeds, rng):
            prepared = prep(params, image=image, mask_image=mask_image,
                            pose_map=pose_map, warped_cloth=warped_cloth,
                            rng=rng)
            intermediate = prepared.pop("intermediate")
            latents = den(params, prepared,
                          prompt_embeds=prompt_embeds,
                          negative_prompt_embeds=negative_prompt_embeds)
            return dec(params, latents, intermediate)

        return sampler
