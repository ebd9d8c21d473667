"""Perf probe: batch-stream overlap in the generation drivers.

VERDICT r3 item 5: prep/decode + host fetch/save must not serialize
with the denoise scan across batches.  The shipped drivers already
software-pipeline this (``_PipelinedSaver``: the device->host fetch of
batch N happens after batch N+1's programs are DISPATCHED, so it
overlaps device compute; host input prep for N+1 likewise runs while N
executes, courtesy of JAX async dispatch).  This probe measures the
actual e2e gain on the real 512x384 B=8 geometry: a 4-batch stream
through (a) a fully serial loop (block-fetch every batch before
dispatching the next) vs (b) the shipped pipelined loop.

Run: python tools/perf.py driver-pipeline
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

B, H, W, STEPS, N_BATCHES = 8, 512, 384, 50, 4
DT = jnp.bfloat16


def main():
    print("devices:", jax.devices(), flush=True)

    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.drivers import _quantize_u8
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    rng = jax.random.key(0)
    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    emasc = EMASC(in_channels=(128, 128, 128, 256, 512),
                  out_channels=(128, 256, 512, 512, 512), dtype=DT)
    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=DDIMScheduler())
    params = {
        "unet": unet.init(rng, jnp.zeros((1, H // 8, W // 8, 31), DT),
                          jnp.asarray([0]), jnp.zeros((1, 77, 1024), DT)),
        "vae": vae.init(rng, jnp.zeros((1, 64, 64, 3), DT)),
        "emasc": emasc.init(rng, [
            jnp.zeros((1, 8, 8, c), DT)
            for c in (128, 128, 128, 256, 512)]),
    }
    params = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, params)
    sampler = pipe.jit_sample(split=True, num_inference_steps=STEPS,
                              guidance_scale=7.5)

    # host-resident inputs: the per-batch jnp.asarray H2D transfer is
    # part of what the pipelined loop hides
    host_batches = [
        {
            "image": np.zeros((B, H, W, 3), np.float32),
            "mask": np.ones((B, H, W, 1), np.float32),
            "pose": np.zeros((B, H, W, 18), np.float32),
            "warped": np.zeros((B, H, W, 3), np.float32),
            "ehs": np.zeros((B, 77, 1024), np.float32),
        }
        for _ in range(N_BATCHES)
    ]

    def dispatch(batch, i):
        out = sampler(
            params, jnp.asarray(batch["image"], DT),
            jnp.asarray(batch["mask"], DT), jnp.asarray(batch["pose"], DT),
            jnp.asarray(batch["warped"], DT), jnp.asarray(batch["ehs"], DT),
            jnp.asarray(batch["ehs"], DT), jax.random.fold_in(rng, i))
        return _quantize_u8(out)

    # warm both programs
    np.asarray(dispatch(host_batches[0], 0))

    def run_serial():
        t0 = time.perf_counter()
        outs = []
        for i, b in enumerate(host_batches):
            outs.append(np.asarray(dispatch(b, i)))  # block per batch
        return time.perf_counter() - t0, outs

    def run_pipelined():
        t0 = time.perf_counter()
        outs, pending = [], None
        for i, b in enumerate(host_batches):
            dev = dispatch(b, i)  # async dispatch first
            if pending is not None:
                outs.append(np.asarray(pending))  # fetch N-1 while N runs
            pending = dev
        outs.append(np.asarray(pending))
        return time.perf_counter() - t0, outs

    ts, outs_s = run_serial()
    tp, outs_p = run_pipelined()
    ts2, _ = run_serial()  # second window each to see variance
    tp2, _ = run_pipelined()
    for a, b in zip(outs_s, outs_p):
        np.testing.assert_array_equal(a, b)
    per_s = min(ts, ts2) / N_BATCHES
    per_p = min(tp, tp2) / N_BATCHES
    print(f"serial:    {per_s*1e3:.0f} ms/batch ({B/per_s:.4f} img/s) "
          f"[windows {ts/N_BATCHES*1e3:.0f} {ts2/N_BATCHES*1e3:.0f}]",
          flush=True)
    print(f"pipelined: {per_p*1e3:.0f} ms/batch ({B/per_p:.4f} img/s) "
          f"[windows {tp/N_BATCHES*1e3:.0f} {tp2/N_BATCHES*1e3:.0f}]",
          flush=True)
    print(f"gain: {(per_s/per_p-1)*100:.1f}% (outputs bit-identical)",
          flush=True)


if __name__ == "__main__":
    main()
