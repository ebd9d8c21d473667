"""Perf probe 4: chained (floor-free) component timings + UNet re-check.

Chains shape-preserving ops inside one jitted fori_loop so the ~3 ms
relay dispatch floor amortizes, giving true device times for convs,
fused GroupNorm+SiLU, resnet blocks and transformer blocks at every
UNet level — then re-times the full UNet forward with the retuned
flash-attention blocks.

Run: python tools/perf.py chained-components [--skip-unet]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("PROBE_B", "16"))
DT = jnp.bfloat16
PEAK = 197e12
CHAIN = 20


def time_chained(fn, x, *extra, iters=3):
    """fn(x, *extra) -> same-shape-as-x; chained CHAIN times."""

    @jax.jit
    def chained(x, *extra):
        def body(i, h):
            return fn(h, *extra).astype(h.dtype)

        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, x).astype(
            jnp.float32))

    np.asarray(chained(x, *extra))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x, *extra)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / CHAIN


def report(name, dt, flops, count):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:32s} {dt*1e3:8.3f} ms x{count:2d} = "
          f"{dt*count*1e3:7.2f} ms   mfu {mfu*100:5.1f}%", flush=True)
    return dt * count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-unet", action="store_true")
    ap.add_argument("--skip-parts", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)
    total = 0.0

    if not args.skip_parts:
        from ladi_vton_tpu.models.layers import ResnetBlock2D, Transformer2D
        from ladi_vton_tpu.ops.group_norm import group_norm

        LEVELS = [(64, 48, 320, 10), (32, 24, 640, 10),
                  (16, 12, 1280, 10), (8, 6, 1280, 16)]
        for h, w, c, count in LEVELS:
            x = jnp.zeros((B, h, w, c), DT)
            conv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
            p = jax.jit(conv.init)(rng, x)
            dt = time_chained(lambda h_, p_: conv.apply(p_, h_), x, p)
            total += report(f"conv3x3 {c}@{h}x{w}", dt,
                            2 * B * h * w * c * c * 9, count)

        for h, w, c, count in LEVELS:
            x = jnp.zeros((B, h, w, c), DT)
            s = jnp.ones((c,), jnp.float32)
            b = jnp.zeros((c,), jnp.float32)
            dt = time_chained(
                lambda h_, s_, b_: group_norm(h_, s_, b_, act="silu"),
                x, s, b)
            total += report(f"gn+silu {c}@{h}x{w}", dt, 0, count)

        # full resnet + transformer blocks per level
        for h, w, c, n_res, n_tfm in [(64, 48, 320, 5, 5),
                                      (32, 24, 640, 5, 5),
                                      (16, 12, 1280, 5, 5),
                                      (8, 6, 1280, 7, 1)]:
            x = jnp.zeros((B, h, w, c), DT)
            temb = jnp.zeros((B, 1280), DT)
            ctx = jnp.zeros((B, 77, 1024), DT)
            res = ResnetBlock2D(c, dtype=DT)
            pr = jax.jit(res.init)(rng, x, temb)
            dt = time_chained(lambda h_, p_, t_: res.apply(p_, h_, t_),
                              x, pr, temb)
            total += report(f"resnet {c}@{h}x{w}", dt, 0, n_res)
            if n_tfm:
                tfm = Transformer2D(c // 64, 64, dtype=DT)
                pt = jax.jit(tfm.init)(rng, x, ctx)
                dt = time_chained(
                    lambda h_, p_, c_: tfm.apply(p_, h_, c_), x, pt, ctx)
                total += report(f"transformer {c}@{h}x{w}", dt, 0, n_tfm)

        print(f"\nreconstructed (resnets+tfms): see blocks above; "
              f"conv+gn rows overlap with block rows. total accum "
              f"{total*1e3:.1f} ms", flush=True)

    if not args.skip_unet:
        from ladi_vton_tpu.models.unet_condition import (
            UNet2DCondition,
            sd2_unet_config,
        )

        unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
        sample = jnp.zeros((B, 64, 48, 31), DT)
        t = jnp.full((B,), 981, jnp.int32)
        ctx = jnp.zeros((B, 77, 1024), DT)
        params = jax.jit(unet.init)(rng, sample[:1], t[:1], ctx[:1])

        def fwd(params, sample, t, ctx):
            return jnp.sum(unet.apply(params, sample, t, ctx).astype(
                jnp.float32))

        opts = os.environ.get("PROBE_COMPILER_OPTIONS")
        if opts:
            kv = dict(p.split("=", 1) for p in opts.split(","))
            forward = (jax.jit(fwd)
                       .lower(params, sample, t, ctx)
                       .compile(compiler_options=kv))
        else:
            forward = jax.jit(fwd)

        np.asarray(forward(params, sample, t, ctx))
        t0 = time.perf_counter()
        for _ in range(10):
            out = forward(params, sample, t, ctx)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 10
        mfu = 0.575e12 * B / dt / PEAK
        print(f"\nUNet fwd (retuned attn): {dt*1e3:.2f} ms  "
              f"mfu {mfu*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
