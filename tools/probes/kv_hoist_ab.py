"""Perf probe: denoise-scan A/B of cross-attn context-KV hoisting.

The prompt embeddings are constant across the 50 denoise steps, so the
32 cross-attention context projections (16 attn2 x K,V) are
loop-invariant.  ``TryOnPipeline(hoist_context_kv=True)`` computes them
once outside the ``lax.scan`` (models/unet_condition.py
precompute_context_kv).  XLA's while-loop LICM may already hoist these
dots, so the win must be measured at the SCAN level, not per UNet call.

Times the full 50-step denoise program (B=8, CFG, 512x384 latents,
bf16) with the flag off vs on.  Numerics are pinned equal by
tests/test_pipeline.py::test_sample_with_kv_hoisting_matches.

Run: python tools/perf.py kv-hoist-ab
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, DT, PEAK = 8, jnp.bfloat16, 197e12
H, W = 512, 384
STEPS = 50


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)

    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
    vae = AutoencoderKL(VAEConfig(), dtype=DT)

    lh, lw = H // 8, W // 8
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, lh, lw, 31), DT), jnp.asarray([0]),
        jnp.zeros((1, 77, 1024), DT))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
        unet_params)
    params = {"unet": unet_params}

    prepared = {
        "latents": jnp.zeros((B, lh, lw, 4), DT),
        "mask_lat": jnp.ones((B, lh, lw, 1), DT),
        "masked_latents": jnp.zeros((B, lh, lw, 4), DT),
        "pose_lat": jnp.zeros((B, lh, lw, 18), DT),
        "cloth_latents": jnp.zeros((B, lh, lw, 4), DT),
    }
    embeds = jnp.zeros((B, 77, 1024), DT)

    for hoist in (False, True):
        pipe = TryOnPipeline(unet=unet, vae=vae, emasc=None,
                             scheduler=DDIMScheduler(),
                             hoist_context_kv=hoist)
        den = jax.jit(lambda p, pr, e, ne, _pipe=pipe: _pipe.denoise(
            p, pr, prompt_embeds=e, negative_prompt_embeds=ne,
            num_inference_steps=STEPS, guidance_scale=7.5))

        def run():
            out = den(params, dict(prepared), embeds, embeds)
            np.asarray(jnp.sum(out))  # relay-proof sync
            return out

        run()  # compile
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            run()
        dt = (time.perf_counter() - t0) / iters
        mfu = 0.575e12 * 2 * B * STEPS / dt / PEAK
        print(f"hoist={hoist!s:5s} denoise(50) {dt*1e3:8.1f} ms  "
              f"({dt*1e3/STEPS:6.2f} ms/step, mfu {mfu*100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
