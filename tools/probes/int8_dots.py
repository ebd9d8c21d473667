"""Perf probe: int8 (W8A8) MXU dots vs bf16 at the UNet matmul shapes.

Measures whether an int8 quantized serving mode would pay on v5e
(which has 2x int8 MXU peak): four recipes per shape, all with the
realistic in-loop cost structure (the activation changes every
iteration, so activation quantization CANNOT be hoisted):

  a) bf16 dot (the shipped path)
  b) int8 dot + per-row fp32 dynamic activation quant
  c) int8 dot + per-tensor scalar dynamic quant, bf16 math
  d) int8 dot + STATIC per-tensor activation scale (a calibrated
     serving mode's ceiling: quant is one fused elementwise op)

Weights are pre-quantized outside the loop (loop-invariant in a real
denoise scan, hoisted by XLA LICM either way).

Result (docs/PERF.md §13): a measured DEAD END — these dots run at
30-60 TF/s bf16 (bandwidth/layout-limited, not MXU-rate-limited), so
doubling the MXU rate buys nothing and the quant/dequant passes cost
extra HBM traffic.  Isolated int8 dots DO show 1.7x at the ff-up shape
when the whole chain stays int8 — unreachable in a real network that
must dequantize between layers.

Run: python tools/perf.py int8-dots
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

ITERS = 30


def _chain(body, K):
    def step(c, _):
        y = body(c)
        N = y.shape[1]
        if N >= K:
            nxt = y[:, :K]
        else:
            nxt = jnp.tile(y, (1, -(-K // N)))[:, :K]
        return nxt.astype(c.dtype), None

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(out[:1, :1].astype(jnp.float32))

    return run


def _timeit(run, x):
    np.asarray(run(x))
    t0 = time.perf_counter()
    np.asarray(run(x))
    return (time.perf_counter() - t0) / ITERS


def bench(M, K, N, tag):
    w = jax.random.normal(jax.random.key(0), (K, N)).astype(jnp.bfloat16)
    w_s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    w_q = jnp.round(w.astype(jnp.float32) / w_s).astype(jnp.int8)
    x0 = jax.random.normal(jax.random.key(1), (M, K)).astype(jnp.bfloat16)
    fl = 2 * M * K * N

    def a_bf16(x):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def b_row(x):
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
        xq = jnp.round(xf / s).astype(jnp.int8)
        y = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s * w_s[None, :])
                ).astype(jnp.bfloat16)

    def c_tensor(x):
        s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
        xq = jnp.round(x * (1.0 / s).astype(jnp.bfloat16)).astype(jnp.int8)
        y = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s * w_s[None, :])
                ).astype(jnp.bfloat16)

    def d_static(x):
        xq = jnp.round(x * jnp.bfloat16(127.0 / 4.0)).astype(jnp.int8)
        y = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * ((4.0 / 127.0) * w_s[None, :])
                ).astype(jnp.bfloat16)

    ta = _timeit(_chain(a_bf16, K), x0)
    tb = _timeit(_chain(b_row, K), x0)
    tc = _timeit(_chain(c_tensor, K), x0)
    td = _timeit(_chain(d_static, K), x0)
    print(f"{tag:16s} M={M:6d} K={K:5d} N={N:5d}: "
          f"bf16 {ta*1e3:6.3f} ({fl/ta/1e12:4.1f}TF) | "
          f"row-dynq {tb*1e3:6.3f} ({ta/tb:4.2f}x) | "
          f"tensor-dynq {tc*1e3:6.3f} ({ta/tc:4.2f}x) | "
          f"static {td*1e3:6.3f} ({ta/td:4.2f}x)")


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    for S, C in ((3072, 320), (768, 640), (192, 1280)):
        M = 16 * S  # CFG batch 16
        bench(M, C, 8 * C, f"ff-up S={S}")
        bench(M, 4 * C, C, f"ff-down S={S}")
    bench(16 * 3072, 320, 320, "qkv S=3072")


if __name__ == "__main__":
    main()
