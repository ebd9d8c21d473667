"""Perf probe 2: per-component breakdown of the UNet step on TPU.

Times each building block at its real shapes (CFG batch 16, SD-2 widths)
and multiplies by per-forward counts to reconstruct where the 126 ms
goes.  Also measures the relay dispatch floor.

Run: python tools/perf.py unet-components
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

B = 16  # CFG batch
DT = jnp.bfloat16
PEAK = 197e12


def timeit(fn, *args, iters=10):
    """fn must return a SCALAR — fetching real outputs through the axon
    relay (~25MB/s) would dwarf the device time being measured."""
    out = fn(*args)
    assert np.asarray(out).size == 1, "timeit needs scalar outputs"
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def scalar(fn):
    """Wrap fn so the jitted program reduces its output on device."""
    return jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
        fn(*a), jnp.float32(0)))


def report(name, dt, flops, count):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:34s} {dt*1e3:8.3f} ms x{count:2d} = "
          f"{dt*count*1e3:8.2f} ms   mfu {mfu*100:5.1f}%", flush=True)
    return dt * count


def conv_flops(h, w, cin, cout, k=3):
    return 2 * B * h * w * cin * cout * k * k


def main():
    print("devices:", jax.devices(), flush=True)

    # dispatch floor
    tiny = jnp.zeros((8, 128), DT)
    f_id = scalar(lambda x: x + 1)
    print(f"dispatch floor: {timeit(f_id, tiny)*1e3:.3f} ms", flush=True)

    total = 0.0
    rng = jax.random.key(0)

    # ---- convs per level: (H, W, C, n_convs_3x3_per_forward)
    # counts: down lvl: 2 resnets x2 convs; up lvl: 3 resnets x2 convs;
    # plus shortcuts/downsample/upsample approximated separately.
    LEVELS = [(64, 48, 320, 10), (32, 24, 640, 10), (16, 12, 1280, 10),
              (8, 6, 1280, 16)]  # lvl3: down2+mid2+up3 resnets = 14 convs+
    for h, w, c, count in LEVELS:
        x = jnp.zeros((B, h, w, c), DT)
        conv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
        p = jax.jit(conv.init)(rng, x)
        dt = timeit(scalar(conv.apply), p, x)
        total += report(f"conv3x3 {c}@{h}x{w}", dt, conv_flops(h, w, c, c),
                        count)

    # ---- GroupNorm+SiLU fused at each level (2 per resnet)
    from ladi_vton_tpu.ops.group_norm import group_norm

    for h, w, c, count in LEVELS:
        x = jnp.zeros((B, h, w, c), DT)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        fn = scalar(lambda x, s, b, c=c: group_norm(x, s, b, act="silu"))
        dt = timeit(fn, x, s, b)
        total += report(f"gn+silu {c}@{h}x{w}", dt, 0, count)

    # ---- self-attention (flash) per level with attention
    from ladi_vton_tpu.ops.flash_attention import flash_attention

    ATTN = [(3072, 5, 2 + 3), (768, 10, 5), (192, 20, 5)]
    for s_, heads, count in ATTN:
        q = jnp.zeros((B, s_, heads, 64), DT)
        fn = scalar(lambda q: flash_attention(q, q, q))
        dt = timeit(fn, q)
        fl = 4 * B * heads * s_ * s_ * 64
        total += report(f"self-attn S={s_} h={heads}", dt, fl, count)

    # ---- cross-attention (Sk=77)
    for s_, heads, count in ATTN:
        q = jnp.zeros((B, s_, heads, 64), DT)
        kv = jnp.zeros((B, 77, heads, 64), DT)
        fn = scalar(lambda q, kv: flash_attention(q, kv, kv))
        dt = timeit(fn, q, kv)
        total += report(f"cross-attn S={s_} h={heads}", dt, 0, count)

    # ---- transformer dense stack per level: qkvo self (4xD^2) +
    # q + kv-from-1024 + o (cross) + GEGLU ff (D->8D/2, 4D->D) + proj in/out
    for s_, heads, count in ATTN:
        d = heads * 64
        x = jnp.zeros((B, s_, d), DT)
        ctx = jnp.zeros((B, 77, 1024), DT)

        class DenseStack(nn.Module):
            @nn.compact
            def __call__(self, x, ctx):
                for name in ("q1", "k1", "v1", "o1", "q2", "o2"):
                    x = nn.Dense(d, dtype=DT, name=name)(x)
                k2 = nn.Dense(d, dtype=DT, name="k2")(ctx)
                g = nn.Dense(d * 8, dtype=DT, name="geglu")(x)
                hh, gate = jnp.split(g, 2, axis=-1)
                return nn.Dense(d, dtype=DT, name="ffout")(
                    hh * nn.gelu(gate)) + k2.sum(1, keepdims=True)

        m = DenseStack()
        p = jax.jit(m.init)(rng, x, ctx)
        dt = timeit(scalar(m.apply), p, x, ctx)
        fl = 2 * B * s_ * d * d * (6 + 8 + 4)
        total += report(f"tfm denses S={s_} d={d}", dt, fl, count)

    # ---- up/down sampling + skip concat approx at level 0
    x = jnp.zeros((B, 32, 24, 640), DT)
    up = nn.Conv(640, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    p = jax.jit(up.init)(rng, jnp.zeros((B, 64, 48, 640), DT))

    def upsample(p, x):
        xx = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return up.apply(p, xx)

    dt = timeit(scalar(upsample), p, x)
    total += report("upsample 640 32->64", dt,
                    conv_flops(64, 48, 640, 640), 3)

    print(f"\nreconstructed total ~ {total*1e3:.1f} ms "
          f"(measured unet fwd: ~126 ms)", flush=True)


if __name__ == "__main__":
    main()
