"""Perf probe 8: attention kernel bake-off at UNet/VAE shapes.

Compares our flash kernel vs jax's built-in TPU flash_attention (and a
couple of its block configs) vs plain XLA, at every attention site:
  level0 self (16, 5, 3072, 64), level1 (16, 10, 768, 64),
  level2 (16, 20, 192, 64), mid (16, 20, 48, 64),
  VAE mid single-head (8, 1, 3072, 512).

Run: python tools/perf.py attention-bakeoff
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

DT = jnp.bfloat16
PEAK = 197e12

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention as jax_flash,
)

from ladi_vton_tpu.ops.attention import xla_attention
from ladi_vton_tpu.ops.flash_attention import flash_attention as ours


def time_chained(fn, q, chain=8, iters=3):
    @jax.jit
    def chained(q):
        def body(i, h):
            return fn(h).astype(h.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, q).astype(
            jnp.float32))

    np.asarray(chained(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(q)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / chain


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for (B, H, S, D) in [(16, 5, 3072, 64), (16, 10, 768, 64),
                         (16, 20, 192, 64), (8, 1, 3072, 512)]:
        # ours/xla take (B, S, H, D); jax_flash takes (B, H, S, D)
        q_bshd = jnp.asarray(rng.standard_normal((B, S, H, D)), DT)
        q_bhsd = jnp.swapaxes(q_bshd, 1, 2)
        flops = 4 * B * H * S * S * D
        rows = []
        rows.append(("ours", time_chained(
            lambda x: ours(x, x, x), q_bshd)))
        rows.append(("xla", time_chained(
            lambda x: xla_attention(x, x, x), q_bshd)))
        try:
            dt = time_chained(lambda x: jax_flash(x, x, x), q_bhsd)
            rows.append(("jax_flash dflt", dt))
        except Exception as e:
            print(f"  jax_flash default failed: {str(e)[:90]}")
        if S >= 512:
            for bq, bk in [(512, min(S, 1024)), (1024, min(S, 1024)),
                           (512, S), (S, S)]:
                try:
                    bs = BlockSizes(block_q=bq, block_k_major=bk,
                                    block_k=bk, block_b=1)
                    dt = time_chained(
                        lambda x: jax_flash(x, x, x, block_sizes=bs),
                        q_bhsd)
                    rows.append((f"jax_flash q{bq}k{bk}", dt))
                except Exception as e:
                    print(f"  jax_flash {bq}/{bk} failed: {str(e)[:90]}")
        for name, dt in rows:
            print(f"B{B} H{H} S{S} D{D} {name:18s} {dt*1e3:7.3f} ms "
                  f"mfu {flops/dt/PEAK*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
