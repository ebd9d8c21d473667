"""Perf probe: single-request (small-batch) try-on latency.

The headline bench measures throughput at the canonical batch 8 (the
reference's eval config); a SERVING deployment also cares about the
latency of one request when the queue is empty.  The MicroBatcher pads
a lone request to the compiled batch, so today a single image costs the
full batch-8 wall time (~4.0 s).  This probe compiles dedicated B=1/2/4
programs (512x384, ddim-50 and dpm-20) and measures their p50 latency —
the number a latency-tier deployment would get by serving a small-batch
program (and the baseline that the ``--tensor_parallel`` path would
have to beat on real multi-chip hardware, which this 1-chip environment
cannot measure).

Run: python tools/perf.py latency
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

H, W = 512, 384
DT = jnp.bfloat16


def main():
    print("devices:", jax.devices(), flush=True)

    from ladi_vton_tpu.diffusion.schedulers import (
        DDIMScheduler,
        DPMSolverMultistepScheduler,
    )
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    rng = jax.random.key(0)
    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    emasc = EMASC(in_channels=(128, 128, 128, 256, 512),
                  out_channels=(128, 256, 512, 512, 512), dtype=DT)

    lh, lw = H // 8, W // 8
    params = {
        "unet": unet.init(rng, jnp.zeros((1, lh, lw, 31), DT),
                          jnp.asarray([0]), jnp.zeros((1, 77, 1024), DT)),
        "vae": vae.init(rng, jnp.zeros((1, 64, 64, 3), DT)),
        "emasc": emasc.init(rng, [
            jnp.zeros((1, 8, 8, c), DT)
            for c in (128, 128, 128, 256, 512)
        ]),
    }
    params = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, params)

    def measure(scheduler, steps, B, n=5):
        import dataclasses as dc

        pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                             scheduler=DDIMScheduler())
        pipe = dc.replace(pipe, scheduler=scheduler)
        sampler = pipe.jit_sample(split=True, num_inference_steps=steps,
                                  guidance_scale=7.5)
        args = (
            jnp.zeros((B, H, W, 3), DT), jnp.ones((B, H, W, 1), DT),
            jnp.zeros((B, H, W, 18), DT), jnp.zeros((B, H, W, 3), DT),
            jnp.zeros((B, 77, 1024), DT), jnp.zeros((B, 77, 1024), DT),
            rng,
        )

        def run():
            out = sampler(params, *args)
            np.asarray(out[:, 0, 0, 0])  # relay-safe sync

        run()  # compile + warm
        per = []
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            per.append(time.perf_counter() - t0)
        return float(np.median(per)), per

    rows = []
    for name, sched, steps in (("ddim50", DDIMScheduler(), 50),
                               ("dpm20", DPMSolverMultistepScheduler(), 20)):
        for B in (1, 2, 4):
            p50, per = measure(sched, steps, B)
            rows.append((name, B, p50, per))
            print(f"{name} B={B}: p50 {p50*1e3:.0f} ms "
                  f"({B/p50:.3f} img/s; runs "
                  + " ".join(f"{t*1e3:.0f}" for t in per) + ")",
                  flush=True)

    print("\nsummary (vs batch-8 throughput config ~4020 ms):")
    for name, B, p50, _ in rows:
        print(f"  {name:7s} B={B}: {p50*1e3:7.0f} ms/request, "
              f"per-image {p50/B*1e3:.0f} ms")


if __name__ == "__main__":
    main()
