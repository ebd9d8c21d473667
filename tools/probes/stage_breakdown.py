"""Perf probe: prep/decode stage internals (B=8, 512x384, bf16).

bench stages (round 3 start): prep 196 ms | decode 162 ms — together
8.6% of e2e.  Attribute the time: the 2B-batched VAE encoder pass, the
EMASC adapters (two 3x3 convs per scale, largest at 512x384x128), the
mask_features gating resizes, latent-space resizes, and the decode with
vs without EMASC injection.

Run: python tools/perf.py stage-breakdown
"""

from __future__ import annotations

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


def report(name, dt, flops=0):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:36s} {dt*1e3:8.2f} ms   mfu {mfu*100:5.1f}%", flush=True)


def time_scalar(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)

    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.emasc import EMASC, mask_features
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    emasc = EMASC(in_channels=(128, 128, 128, 256, 512),
                  out_channels=(128, 256, 512, 512, 512), dtype=DT)
    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=DDIMScheduler())

    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3), DT))
    feats_shapes = [(1, H, W, 128), (1, H, W, 128),
                    (1, H // 2, W // 2, 128), (1, H // 4, W // 4, 256),
                    (1, H // 8, W // 8, 512)]
    # NB: emasc consumes taps int_layers (1,2,3,4,5) of the 6 encoder
    # feats; shapes checked against the live encoder below.
    emasc_params = None

    image = jnp.zeros((B, H, W, 3), DT)
    mask = jnp.ones((B, H, W, 1), DT)
    pose = jnp.zeros((B, H, W, 18), DT)
    cloth = jnp.zeros((B, H, W, 3), DT)

    params = {"vae": vae_params}

    # ---- encoder: the batched 2B pass exactly as prep runs it
    @jax.jit
    def enc2b(p, a, b):
        both = jnp.concatenate([a, b])
        moments, feats = vae.apply(p, both, method="encode")
        return (jnp.sum(moments.astype(jnp.float32))
                + sum(jnp.sum(f.astype(jnp.float32)) for f in feats))

    report("encoder 2B=16 (cloth+masked)",
           time_scalar(enc2b, vae_params, cloth, image))

    @jax.jit
    def enc1b(p, a):
        moments, feats = vae.apply(p, a, method="encode")
        return (jnp.sum(moments.astype(jnp.float32))
                + sum(jnp.sum(f.astype(jnp.float32)) for f in feats))

    report("encoder 1B=8", time_scalar(enc1b, vae_params, image))

    # live feature shapes for the emasc taps
    moments, feats = jax.jit(
        lambda p, a: vae.apply(p, a, method="encode"))(vae_params,
                                                       image[:1])
    print("encoder feats:", [f.shape for f in feats], flush=True)
    taps = [feats[i] for i in (1, 2, 3, 4, 5)]
    emasc_params = jax.jit(emasc.init)(rng, [jnp.zeros_like(t)
                                             for t in taps])
    taps_b = [jnp.zeros((B,) + t.shape[1:], DT) for t in taps]

    @jax.jit
    def em(p, taps, mask):
        out = emasc.apply(p, taps)
        out = mask_features(out, mask)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    report("emasc + mask_features", time_scalar(em, emasc_params,
                                                taps_b, mask))

    # ---- full prep as the pipeline runs it
    full_params = {"vae": vae_params, "emasc": emasc_params}

    @jax.jit
    def prep(p, image, mask, pose, cloth, rng):
        out = pipe.prepare(p, image=image, mask_image=mask, pose_map=pose,
                           warped_cloth=cloth, rng=rng)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    report("prep total", time_scalar(prep, full_params, image, mask,
                                     pose, cloth, rng))

    # ---- decode with / without EMASC injection.  Injection features
    # carry the EMASC *out* channels at the tap resolutions.
    z = jnp.zeros((B, H // 8, W // 8, 4), DT)
    inter = [jnp.zeros((B,) + t.shape[1:3] + (oc,), DT)
             for t, oc in zip(taps, (128, 256, 512, 512, 512))]

    @jax.jit
    def dec_plain(p, z):
        return jnp.sum(vae.apply(p, z, method="decode").astype(
            jnp.float32))

    report("decode plain", time_scalar(dec_plain, vae_params, z))

    @jax.jit
    def dec_emasc(p, z, inter):
        return jnp.sum(vae.apply(p, z, inter, (1, 2, 3, 4, 5),
                                 method="decode").astype(jnp.float32))

    report("decode + emasc injection",
           time_scalar(dec_emasc, vae_params, z, inter))

    @jax.jit
    def dec_pipe(p, z, inter):
        return jnp.sum(pipe.decode(p, z, inter).astype(jnp.float32))

    report("pipe.decode (clip+fp32)",
           time_scalar(dec_pipe, full_params, z, inter))


if __name__ == "__main__":
    main()
