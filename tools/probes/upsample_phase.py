"""Perf probe 7: nearest-up2+conv3x3 — naive vs 4-phase fused, per site.

Sites: VAE decoder upsamples (512@64x48, 512@128x96, 256@256x192, B=8)
and UNet up-path upsamples (1280@8x6, 1280@16x12, 640@32x24, B=16).

Run: python tools/perf.py upsample-phase
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
PEAK = 197e12

from ladi_vton_tpu.ops.upsample import nearest_up2_conv3x3


def naive(x, k, b):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    dn = lax.conv_dimension_numbers(up.shape, k.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        up, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn) + b


def time_chained(fn, x, k, b, chain=8, iters=3):
    @jax.jit
    def chained(x, k, b):
        def body(i, h):
            # output is (B,2H,2W,C) — pool back down so shapes chain
            y = fn(h, k, b)
            return y[:, ::2, ::2, :].astype(h.dtype)

        return jnp.sum(lax.fori_loop(0, chain, body, x).astype(jnp.float32))

    np.asarray(chained(x, k, b))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x, k, b)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / chain


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for (B, h, w, c) in [(8, 64, 48, 512), (8, 128, 96, 512),
                         (8, 256, 192, 256), (16, 8, 6, 1280),
                         (16, 16, 12, 1280), (16, 32, 24, 640)]:
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), DT)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, DT)
        b = jnp.zeros((c,), DT)
        flops_naive = 2 * B * (2 * h) * (2 * w) * c * c * 9
        flops_fused = 2 * B * (2 * h) * (2 * w) * c * c * 4
        dt_n = time_chained(naive, x, k, b)
        dt_f = time_chained(nearest_up2_conv3x3, x, k, b)
        print(f"up2conv {c}@{h}x{w} B={B}: naive {dt_n*1e3:7.2f} ms "
              f"(mfu {flops_naive/dt_n/PEAK*100:5.1f}%)  fused "
              f"{dt_f*1e3:7.2f} ms (mfu {flops_fused/dt_f/PEAK*100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
