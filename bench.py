"""Benchmark: end-to-end try-on sampling throughput on one TPU chip.

Measures the canonical eval config of the reference — 512x384, DDIM 50
steps, guidance 7.5 (reference: src/inference.py:58,86-87,
README.md:154-175) — through the full jitted pipeline (VAE encodes,
EMASC, 50-step scan, EMASC-aware decode) with SD-2-sized towers in
bfloat16 and random weights (throughput is weight-independent).

Prints ONE JSON line: images/sec/chip.  ``vs_baseline`` is the ratio to
an A100 running the torch reference (no published number exists —
BASELINE.md — so the anchor is the commonly observed ~1.75 img/s for
batched fp16+xformers SD-2-inpainting at 512x384/50 steps; see
BASELINE.md "Rebuild targets").
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the 50-step pipeline is a large XLA
# program and this host has a single CPU core — warm-cache runs skip
# multi-minute compiles.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Estimated torch-reference anchor.  Derivation + sensitivity bracket
# (1.6-1.9 img/s from A100 fp16 peak x typical SD-UNet MFU) recorded in
# BASELINE.md "Anchor derivation".
REF_A100_IMG_PER_SEC = 1.75


def main(batch_sweep=None):
    """Default (no args): the driver's headline bench at B=8.

    ``batch_sweep=[8,16,24,32]`` (CLI ``--batch 8,16,24,32``) instead
    measures img/s/chip at each batch size for ddim-50 and dpm-20 — the
    batch-axis probe (VERDICT r4 item 2).  Headline semantics unchanged:
    the driver runs bench.py with no args.
    """
    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        B, H, W, steps = 8, 512, 384, 50
        dtype = jnp.bfloat16
        unet_cfg = sd2_unet_config(31)
        vae_cfg = VAEConfig()
        emasc_in = (128, 128, 128, 256, 512)
        emasc_out = (128, 256, 512, 512, 512)
        ctx = 1024
    else:  # smoke mode off-TPU: tiny towers, same architecture & flow
        B, H, W, steps = 1, 64, 64, 2
        dtype = jnp.float32
        unet_cfg = UNetConfig(in_channels=31,
                              block_out_channels=(32, 64, 64, 64),
                              head_dim=8, cross_attention_dim=64)
        vae_cfg = VAEConfig(block_out_channels=(32, 32, 64, 64))
        emasc_in = (32, 32, 32, 32, 64)
        emasc_out = (32, 32, 64, 64, 64)
        ctx = 64

    rng = jax.random.key(0)
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    emasc = EMASC(in_channels=emasc_in, out_channels=emasc_out, dtype=dtype)
    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=DDIMScheduler())

    lh, lw = H // 8, W // 8
    params = {
        "unet": unet.init(rng, jnp.zeros((1, lh, lw, 31), dtype),
                          jnp.asarray([0]), jnp.zeros((1, 77, ctx), dtype)),
        "vae": vae.init(rng, jnp.zeros((1, 64, 64, 3), dtype)),
        "emasc": emasc.init(rng, [
            jnp.zeros((1, 8, 8, c), dtype) for c in emasc_in
        ]),
    }
    if on_tpu:
        # inference runs pure bf16: params in bf16 halve the weight HBM
        # traffic per UNet call (0.9B params x 50 steps dominates reads)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def make_args(b):
        return dict(
            image=jnp.zeros((b, H, W, 3), dtype),
            mask_image=jnp.ones((b, H, W, 1), dtype),
            pose_map=jnp.zeros((b, H, W, 18), dtype),
            warped_cloth=jnp.zeros((b, H, W, 3), dtype),
            prompt_embeds=jnp.zeros((b, 77, ctx), dtype),
            negative_prompt_embeds=jnp.zeros((b, 77, ctx), dtype),
            rng=rng,
        )

    sampler = pipe.jit_sample(split=True, num_inference_steps=steps,
                              guidance_scale=7.5)
    args = make_args(B)

    import sys

    import numpy as np

    def make_run(smplr, a):
        def run():
            out = smplr(params, a["image"], a["mask_image"],
                        a["pose_map"], a["warped_cloth"],
                        a["prompt_embeds"], a["negative_prompt_embeds"],
                        a["rng"])
            # NB: block_until_ready is unreliable through the axon relay
            # — force a (tiny) host fetch to serialize properly
            np.asarray(out[:, 0, 0, 0])
            return out
        return run

    def timed_windows(run, n_windows, iters_per_window):
        """Median-of-windows discipline (VERDICT r3 weak #3): the
        headline is the MEDIAN window, with the spread on stderr so a
        threshold claim inside run-to-run variance is visible."""
        run()  # compile + warm
        per_window = []
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(iters_per_window):
                run()
            per_window.append(
                (time.perf_counter() - t0) / iters_per_window)
        return float(np.median(per_window)), per_window

    if batch_sweep:
        # --batch sweep: per-B img/s for ddim-50 and dpm-20 (stderr gets
        # the table; stdout one JSON line with the full sweep)
        import dataclasses as dc

        from ladi_vton_tpu.diffusion.schedulers import (
            DPMSolverMultistepScheduler,
        )

        dpm_pipe = dc.replace(pipe, scheduler=DPMSolverMultistepScheduler())
        dpm_sampler = dpm_pipe.jit_sample(split=True,
                                          num_inference_steps=20,
                                          guidance_scale=7.5)
        sweep = {}
        for b in batch_sweep:
            row = {}
            for tag, smplr in (("ddim50", sampler), ("dpm20", dpm_sampler)):
                run_b = make_run(smplr, make_args(b))
                dt, windows = timed_windows(run_b, n_windows=3,
                                            iters_per_window=1)
                spread = (max(windows) - min(windows)) / dt * 100
                row[tag] = {"img_per_sec": round(b / dt, 4),
                            "ms_per_batch": round(dt * 1e3, 1),
                            "spread_pct": round(spread, 1)}
                print(f"B={b} {tag}: {b/dt:.4f} img/s "
                      f"({dt*1e3:.0f} ms/batch, spread {spread:.1f}%)",
                      file=sys.stderr, flush=True)
            sweep[str(b)] = row
        print(json.dumps({"metric": "batch_sweep_512x384", "value": sweep,
                          "unit": "images/sec"}))
        return

    run = make_run(sampler, args)
    if on_tpu:
        dt, windows = timed_windows(run, n_windows=3, iters_per_window=2)
        spread = (max(windows) - min(windows)) / dt * 100
        print(f"windows(B={B}, ddim50): "
              + " ".join(f"{w*1e3:.0f}ms" for w in windows)
              + f" -> median {dt*1e3:.0f} ms (spread {spread:.1f}%)",
              file=sys.stderr, flush=True)
    else:
        dt, _ = timed_windows(run, n_windows=1, iters_per_window=1)
    img_per_sec = B / dt

    if on_tpu:
        _report_stages(pipe, params, args, B, dt)
        _report_dpm20(pipe, params, args, B)
        print("scope: pipeline stages only (VAE encodes + EMASC + "
              "denoise scan + decode), matching the reference "
              "tryon_pipe; the conditioning stage (TPS/CLIP/adapter/"
              "text, reference inference.py:269-295) is measured "
              "separately by tools/perf.py condition-bench",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "vitonhd_512x384_ddim50_images_per_sec_per_chip",
        "value": round(img_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REF_A100_IMG_PER_SEC, 4),
    }))


def _report_dpm20(pipe, params, args, B):
    """Secondary metric: DPM-Solver++(2M) at 20 steps — ~DDIM-50 quality
    (arXiv 2211.01095) at 2.5x fewer UNet calls.  Stderr only; the
    headline stays the reference's canonical ddim-50 config."""
    import dataclasses as dc
    import sys

    import numpy as np

    from ladi_vton_tpu.diffusion.schedulers import (
        DPMSolverMultistepScheduler,
    )

    dpm_pipe = dc.replace(pipe, scheduler=DPMSolverMultistepScheduler())
    sampler = dpm_pipe.jit_sample(split=True, num_inference_steps=20,
                                  guidance_scale=7.5)

    def run():
        out = sampler(params, args["image"], args["mask_image"],
                      args["pose_map"], args["warped_cloth"],
                      args["prompt_embeds"], args["negative_prompt_embeds"],
                      args["rng"])
        np.asarray(out[:, 0, 0, 0])

    run()  # compile
    per = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        per.append(time.perf_counter() - t0)
    dt = float(np.median(per))
    print(f"secondary: dpm20 {B/dt:.4f} img/s (median of 3; "
          f"{dt*1e3:.0f} ms/batch, ~DDIM-50 quality at 20 steps)",
          file=sys.stderr, flush=True)


def _report_stages(pipe, params, args, B, total_dt):
    """Per-stage timing + FLOPs-based MFU, to stderr (the driver parses
    stdout for the single JSON line)."""
    import sys

    import numpy as np

    def sync(out):
        # fetch ONE element (device-side reduce first): np.asarray on the
        # full array would pull hundreds of MB through the relay and
        # pollute the timing (decode's output alone is 75MB fp32)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))

    def timeit(fn, iters=2):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters

    prep = jax.jit(pipe.prepare)
    den = jax.jit(lambda p, pr, e, ne: pipe.denoise(
        p, pr, prompt_embeds=e, negative_prompt_embeds=ne,
        num_inference_steps=50, guidance_scale=7.5))
    dec = jax.jit(pipe.decode)
    prepared = prep(params, image=args["image"],
                    mask_image=args["mask_image"],
                    pose_map=args["pose_map"],
                    warped_cloth=args["warped_cloth"], rng=args["rng"])
    intermediate = prepared.pop("intermediate")
    e = args["prompt_embeds"]
    t_prep = timeit(lambda: prep(
        params, image=args["image"], mask_image=args["mask_image"],
        pose_map=args["pose_map"], warped_cloth=args["warped_cloth"],
        rng=args["rng"]))
    latents = den(params, prepared, e, e)
    t_den = timeit(lambda: den(params, prepared, e, e))
    t_dec = timeit(lambda: dec(params, latents, intermediate), iters=4)
    # analytic UNet FLOPs: ~0.575 TF per image-forward at 64x48 latents
    # (full conv/attn/ff accounting, docs/PERF.md §9), CFG doubles it
    unet_flops = 0.575e12 * (2 * B) * 50
    mfu = unet_flops / t_den / 197e12
    print(f"stages(B={B}): prep {t_prep*1e3:.0f} ms | denoise(50) "
          f"{t_den*1e3:.0f} ms ({t_den*20:.1f} ms/step, "
          f"denoise-MFU {mfu*100:.1f}%) | decode {t_dec*1e3:.0f} ms | "
          f"e2e {total_dt*1e3:.0f} ms", file=sys.stderr, flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=str, default=None,
                    help="comma-separated batch sizes to sweep "
                         "(e.g. 8,16,24,32) instead of the headline run")
    cli = ap.parse_args()
    main([int(b) for b in cli.batch.split(",")] if cli.batch else None)
