"""Probe: head-major (bhsd) attention layout vs the BSHD transpose path.

The round-2 device trace attributed 6.8 ms of every 78.8 ms UNet step
to layout copies; the prime suspects are the (B,S,H,D)<->(B*H,S,D)
transposes around every flash-attention call.  ``attn_impl="bhsd"``
folds the head split/merge into the projection einsums
(``bsc,chd->bhsd``) so the kernel operands come straight out of the
matmuls.  This probe A/Bs the FULL UNet step (fusion-boundary-honest)
and the isolated attention sites.

Run: python tools/perf.py attention-layout
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

B, DT, PEAK = 16, jnp.bfloat16, 197e12

from ladi_vton_tpu.models.unet_condition import (
    UNet2DCondition,
    sd2_unet_config,
)


def time_unet(attn_impl: str) -> float:
    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT,
                           attn_impl=attn_impl)
    rng = jax.random.key(0)
    sample = jnp.zeros((B, 64, 48, 31), DT)
    t = jnp.full((B,), 981, jnp.int32)
    ctx = jnp.zeros((B, 77, 1024), DT)
    params = jax.jit(unet.init)(rng, sample[:1], t[:1], ctx[:1])

    @jax.jit
    def fwd(params, sample, t, ctx):
        return jnp.sum(unet.apply(params, sample, t, ctx).astype(
            jnp.float32))

    np.asarray(fwd(params, sample, t, ctx))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fwd(params, sample, t, ctx)
    np.asarray(out)
    return (time.perf_counter() - t0) / 10


def main():
    print("devices:", jax.devices(), flush=True)
    for impl in ("auto", "bhsd"):
        dt = time_unet(impl)
        mfu = 0.575e12 * B / dt / PEAK
        print(f"unet attn_impl={impl:5s} {dt*1e3:7.2f} ms  "
              f"mfu {mfu*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
