"""Perf probe 9: fused pallas GEGLU vs XLA at UNet FF shapes.

Shapes (rows = B*S): level0 (16*3072, 320), level1 (16*768, 640),
level2 (16*192, 1280), mid (16*48, 1280).

Run: python tools/perf.py geglu
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

from ladi_vton_tpu.ops.geglu import _geglu, geglu_xla


def time_chained(fn, x, *w, chain=8, iters=3):
    @jax.jit
    def chained(x, *w):
        def body(i, h):
            return fn(h, *w).astype(h.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(
            jnp.float32))

    np.asarray(chained(x, *w))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x, *w)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / chain


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for (B, S, C) in [(16, 3072, 320), (16, 768, 640), (16, 192, 1280),
                      (16, 48, 1280)]:
        I = 4 * C
        x = jnp.asarray(rng.standard_normal((B, S, C)) * 0.1, DT)
        w1 = jnp.asarray(rng.standard_normal((C, 2 * I)) * 0.02, DT)
        b1 = jnp.zeros((2 * I,), DT)
        w2 = jnp.asarray(rng.standard_normal((I, C)) * 0.02, DT)
        b2 = jnp.zeros((C,), DT)
        flops = 2 * B * S * (C * 2 * I + I * C)
        # numerics check once per shape
        a = _geglu(x, w1, b1, w2, b2, 512 if 2 * I <= 5120 else 256, False)
        b = geglu_xla(x, w1, b1, w2, b2)
        err = float(jnp.abs(a.astype(jnp.float32) -
                            b.astype(jnp.float32)).max())
        for name, fn in [
            ("pallas", lambda x_, *w_: _geglu(
                *(x_,) + w_, 512 if 2 * I <= 5120 else 256, False)),
            ("xla", geglu_xla),
        ]:
            dt = time_chained(fn, x, w1, b1, w2, b2)
            print(f"geglu C={C} S={S} {name:7s} {dt*1e3:7.3f} ms  "
                  f"mfu {flops/dt/PEAK*100:5.1f}%  (maxerr {err:.4f})",
                  flush=True)


if __name__ == "__main__":
    main()
