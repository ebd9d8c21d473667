"""Perf probe 5: level-0 transformer internals (S=3072, d=320, B=16).

The full Transformer2D measures ~8 ms; tuned self-attention is ~3.1 ms.
Times each sub-part chained to find the rest: GN, proj_in/out, the
LayerNorms, QKV/out denses (split vs fused), GEGLU FF, cross-attention
(flash vs XLA at Sk=77).

Run: python tools/perf.py transformer-internals
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

B, S, D = 16, 3072, 320
DT = jnp.bfloat16
PEAK = 197e12
CHAIN = 20


def time_chained(fn, x, *extra, iters=3):
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


def report(name, dt, flops=0):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:30s} {dt*1e3:8.3f} ms   mfu {mfu*100:5.1f}%",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, S, D)), DT)
    ctx = jnp.zeros((B, 77, 1024), DT)

    # LayerNorm
    ln = nn.LayerNorm(epsilon=1e-5, dtype=DT)
    p = jax.jit(ln.init)(rng, x)
    report("layernorm", time_chained(lambda h, p: ln.apply(p, h), x, p))

    # single dense D->D
    d1 = nn.Dense(D, dtype=DT)
    p = jax.jit(d1.init)(rng, x)
    report("dense 320->320",
           time_chained(lambda h, p: d1.apply(p, h), x, p),
           2 * B * S * D * D)

    # three separate qkv denses vs one fused
    class QKV3(nn.Module):
        @nn.compact
        def __call__(self, h):
            q = nn.Dense(D, use_bias=False, dtype=DT, name="q")(h)
            k = nn.Dense(D, use_bias=False, dtype=DT, name="k")(h)
            v = nn.Dense(D, use_bias=False, dtype=DT, name="v")(h)
            return q + k + v

    m = QKV3()
    p = jax.jit(m.init)(rng, x)
    report("qkv split (3 matmuls)",
           time_chained(lambda h, p: m.apply(p, h), x, p),
           3 * 2 * B * S * D * D)

    class QKV1(nn.Module):
        @nn.compact
        def __call__(self, h):
            qkv = nn.Dense(3 * D, use_bias=False, dtype=DT, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return q + k + v

    m = QKV1()
    p = jax.jit(m.init)(rng, x)
    report("qkv fused (1 matmul)",
           time_chained(lambda h, p: m.apply(p, h), x, p),
           3 * 2 * B * S * D * D)

    # GEGLU FF
    class FF(nn.Module):
        @nn.compact
        def __call__(self, h):
            g = nn.Dense(D * 8, dtype=DT, name="proj")(h)
            a, b = jnp.split(g, 2, axis=-1)
            return nn.Dense(D, dtype=DT, name="out")(
                a * nn.gelu(b, approximate=False))

    m = FF()
    p = jax.jit(m.init)(rng, x)
    report("geglu ff", time_chained(lambda h, p: m.apply(p, h), x, p),
           2 * B * S * D * D * (8 + 4))

    # cross attention flash vs xla at Sk=77
    from ladi_vton_tpu.ops.attention import xla_attention
    from ladi_vton_tpu.ops.flash_attention import flash_attention

    H = 5
    q4 = x.reshape(B, S, H, 64)
    kv = jnp.zeros((B, 77, H, 64), DT)
    report("cross flash Sk=77",
           time_chained(lambda q, kv: flash_attention(
               q, kv, kv).reshape(B, S, H, 64), q4, kv))
    report("cross xla Sk=77",
           time_chained(lambda q, kv: xla_attention(
               q, kv, kv).reshape(B, S, H, 64), q4, kv))

    # self attention current default for reference
    report("self flash (tuned)",
           time_chained(lambda q: flash_attention(q, q, q), q4),
           4 * B * H * S * S * 64)

    # whole transformer block for the total
    from ladi_vton_tpu.models.layers import Transformer2D

    xt = x.reshape(B, 64, 48, D)
    tfm = Transformer2D(H, 64, dtype=DT)
    p = jax.jit(tfm.init)(rng, xt, ctx)
    report("Transformer2D total",
           time_chained(lambda h, p, c: tfm.apply(p, h, c), xt, p, ctx))


if __name__ == "__main__":
    main()
