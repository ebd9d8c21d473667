"""Perf probe 6: VAE decode breakdown (B=8, 512x384 output, bf16).

bench stages show decode at 566 ms vs ~50 ms analytic ideal.  Times the
full decode, the high-resolution GroupNorms (two-pass tiled path),
high-res convs, the mid-block attention, and upsample copies.

Run: python tools/perf.py vae-decode
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
DT = jnp.bfloat16
PEAK = 197e12


def report(name, dt, flops=0):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:34s} {dt*1e3:8.2f} ms   mfu {mfu*100:5.1f}%", flush=True)


def time_scalar(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def time_chained(fn, x, *extra, chain=8, iters=3):
    @jax.jit
    def chained(x, *extra):
        def body(i, h):
            return fn(h, *extra).astype(h.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(
            jnp.float32))

    np.asarray(chained(x, *extra))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x, *extra)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / chain


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)

    # ---- full decode
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3), DT))
    z = jnp.zeros((B, 64, 48, 4), DT)

    @jax.jit
    def dec(p, z):
        return jnp.sum(vae.apply(p, z, method="decode").astype(
            jnp.float32))

    report("vae decode total", time_scalar(dec, params, z))

    @jax.jit
    def enc(p, x):
        m, f = vae.apply(p, x, method="encode")
        return jnp.sum(m.astype(jnp.float32))

    x_img = jnp.zeros((B, 512, 384, 3), DT)
    report("vae encode total", time_scalar(enc, params, x_img))

    # ---- high-res GroupNorm paths
    from ladi_vton_tpu.ops.group_norm import group_norm, group_norm_xla

    for (h, w, c) in [(512, 384, 128), (256, 192, 256), (128, 96, 512)]:
        x = jnp.zeros((B, h, w, c), DT)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        dt = time_chained(
            lambda h_, s_, b_: group_norm(h_, s_, b_, act="silu"), x, s, b)
        report(f"gn pallas {c}@{h}x{w}", dt)
        dt = time_chained(
            lambda h_, s_, b_: group_norm_xla(h_, s_, b_, act="silu"),
            x, s, b)
        report(f"gn xla    {c}@{h}x{w}", dt)

    # ---- high-res convs
    for (h, w, c) in [(512, 384, 128), (256, 192, 256), (128, 96, 512)]:
        x = jnp.zeros((B, h, w, c), DT)
        conv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
        p = jax.jit(conv.init)(rng, x)
        dt = time_chained(lambda h_, p_: conv.apply(p_, h_), x, p)
        report(f"conv3x3 {c}@{h}x{w}", dt, 2 * B * h * w * c * c * 9)

    # ---- mid-block single-head attention (S=3072, D=512, xla)
    from ladi_vton_tpu.ops.attention import xla_attention
    from ladi_vton_tpu.ops.flash_attention import flash_attention

    q = jnp.zeros((B, 3072, 1, 512), DT)
    report("vae attn xla S=3072 D=512",
           time_chained(lambda q_: xla_attention(q_, q_, q_), q, chain=4),
           4 * B * 3072 * 3072 * 512)
    report("vae attn flash S=3072 D=512",
           time_chained(lambda q_: flash_attention(q_, q_, q_), q,
                        chain=4),
           4 * B * 3072 * 3072 * 512)


if __name__ == "__main__":
    main()
