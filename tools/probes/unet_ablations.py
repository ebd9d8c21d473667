"""Perf probe: where does the denoise step's time go on the TPU?

Times (a) one extended-UNet forward at the canonical eval shape
(CFG batch 2x8, 64x48 latents, bf16) under ablations — attention impl,
param dtype — and (b) the pipeline stages (prep / 50-step scan /
decode).  Host-side timing only (device profiling is unavailable through
the axon relay), serialized by fetching one scalar.

Usage: python tools/perf.py unet-ablations [--skip-stages]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8          # images
CFG_B = 2 * B  # CFG doubles the unet batch
LH, LW = 64, 48
CTX = 1024


def timeit(fn, *args, iters=8, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def unet_flops_per_call() -> float:
    """Analytic FLOPs of one SD-2 UNet forward at 64x48, CFG batch 16:
    ~0.575 TF per image (convs 0.30, attention+denses 0.27)."""
    return 0.575e12 * CFG_B


def probe_unet(attn_impl: str, params_dtype):
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )

    unet = UNet2DCondition(sd2_unet_config(31), attn_impl=attn_impl,
                           dtype=jnp.bfloat16)
    sample = jnp.zeros((CFG_B, LH, LW, 31), jnp.bfloat16)
    t = jnp.full((CFG_B,), 981, jnp.int32)
    ctx = jnp.zeros((CFG_B, 77, CTX), jnp.bfloat16)
    params = jax.jit(unet.init)(jax.random.key(0), sample[:1], t[:1],
                                ctx[:1])
    if params_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(params_dtype)
            if x.dtype == jnp.float32 else x, params)

    fn = jax.jit(unet.apply)
    dt = timeit(fn, params, sample, t, ctx)
    mfu = unet_flops_per_call() / dt / 197e12
    print(f"unet attn={attn_impl:7s} params={str(params_dtype):14s} "
          f"-> {dt*1e3:8.2f} ms/step   est-MFU {mfu*100:5.1f}%",
          flush=True)
    return dt


def probe_stages():
    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    dtype = jnp.bfloat16
    unet = UNet2DCondition(sd2_unet_config(31), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    emasc_in = (128, 128, 128, 256, 512)
    emasc_out = (128, 256, 512, 512, 512)
    emasc = EMASC(in_channels=emasc_in, out_channels=emasc_out, dtype=dtype)
    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=DDIMScheduler())
    rng = jax.random.key(0)
    params = {
        "unet": jax.jit(unet.init)(rng, jnp.zeros((1, LH, LW, 31), dtype),
                                   jnp.asarray([0]),
                                   jnp.zeros((1, 77, CTX), dtype)),
        "vae": jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3), dtype)),
        "emasc": jax.jit(emasc.init)(rng, [
            jnp.zeros((1, 8, 8, c), dtype) for c in emasc_in]),
    }
    H, W = 512, 384
    image = jnp.zeros((B, H, W, 3), dtype)
    mask = jnp.ones((B, H, W, 1), dtype)
    pose = jnp.zeros((B, H, W, 18), dtype)
    cloth = jnp.zeros((B, H, W, 3), dtype)
    embeds = jnp.zeros((B, 77, CTX), dtype)

    prep = jax.jit(pipe.prepare)
    den = jax.jit(lambda p, pr, e, ne: pipe.denoise(
        p, pr, prompt_embeds=e, negative_prompt_embeds=ne,
        num_inference_steps=50, guidance_scale=7.5))
    dec = jax.jit(pipe.decode)

    prepared = prep(params, image=image, mask_image=mask, pose_map=pose,
                    warped_cloth=cloth, rng=rng)
    intermediate = prepared.pop("intermediate")

    t_prep = timeit(lambda: prep(params, image=image, mask_image=mask,
                                 pose_map=pose, warped_cloth=cloth,
                                 rng=rng), iters=3)
    t_den = timeit(lambda: den(params, prepared, embeds, embeds), iters=3)
    t_dec = timeit(lambda: dec(params, den(params, prepared, embeds,
                                           embeds), intermediate),
                   iters=3) - t_den
    total = t_prep + t_den + max(t_dec, 0.0)
    print(f"stages: prep {t_prep*1e3:8.1f} ms | denoise(50) "
          f"{t_den*1e3:8.1f} ms ({t_den*20:.1f} ms/step) | decode "
          f"{t_dec*1e3:8.1f} ms | total {total*1e3:8.1f} ms "
          f"-> {B/total:.3f} img/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--skip-unet", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if not args.skip_unet:
        probe_unet("pallas", None)            # fp32 params (today's bench)
        probe_unet("pallas", jnp.bfloat16)    # bf16 params
        probe_unet("xla", jnp.bfloat16)       # XLA attention
    if not args.skip_stages:
        probe_stages()


if __name__ == "__main__":
    main()
