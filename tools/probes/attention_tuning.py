"""Perf probe 3: flash-attention block tuning at the UNet's hot shape.

S=3072, H=5, D=64, CFG batch 16 — the level-0 self-attention that
probe2 showed at ~11% MFU.  Chains 20 attention calls inside ONE
jitted program (output feeds the next query) so the ~3 ms relay
dispatch floor amortizes away.

Run: python tools/perf.py attention-tuning
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

B, S, H, D = 16, 3072, 5, 64
CHAIN = 20
FLOPS = 4 * B * H * S * S * D * CHAIN
PEAK = 197e12


def time_chained(fn, q, k, v, iters=3):
    @jax.jit
    def chained(q, k, v):
        def body(i, x):
            return fn(x, k, v)

        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, q).astype(
            jnp.float32))

    out = chained(q, k, v)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(q, k, v)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / CHAIN


def main():
    from ladi_vton_tpu.ops.attention import xla_attention
    from ladi_vton_tpu.ops.flash_attention import flash_attention

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    configs = [(256, 256), (512, 512), (512, 1024), (1024, 512),
               (1024, 1024), (512, 3072), (1024, 3072), (3072, 1024)]
    for bq, bk in configs:
        fn = lambda q_, k_, v_, bq=bq, bk=bk: flash_attention(
            q_, k_, v_, block_q=bq, block_k=bk)
        dt = time_chained(fn, q, k, v)
        print(f"flash bq={bq:5d} bk={bk:5d} -> {dt*1e3:7.3f} ms/call  "
              f"mfu {FLOPS/CHAIN/dt/PEAK*100:5.1f}%", flush=True)

    dt = time_chained(lambda q_, k_, v_: xla_attention(q_, k_, v_), q, k, v)
    print(f"xla attention          -> {dt*1e3:7.3f} ms/call  "
          f"mfu {FLOPS/CHAIN/dt/PEAK*100:5.1f}%", flush=True)

    # numerics guard: best config must match the oracle
    ref = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=512, block_k=1024)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"max |flash-xla| = {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
