"""Perf probe: why are the transformer-block projection dots slow?

The round-3 UNet device trace (probe `unet-trace`) shows the level-0
attention projections — e.g. proj_out [16,3072,320]x[320,320], ~10 GF —
taking 0.75-0.78 ms (≈7% MFU) with odd {1,2,0} output layouts, while
the neighbouring resnet convs run at ~70% MFU.  ~11 such dots per step
could hide 6-8 ms.  This probe times the dot in isolation under layout
variants to separate "XLA can't run this shape fast" from "the fusion
context forces a bad layout":

  3d        dot_general (B,S,C)x(C,C) as the model emits it
  2d        explicit reshape to (B*S, C) then 2D dot
  3d-chain  3d dot chained with a bhsd einsum consumer (q projection
            shape) — reproduces the in-graph layout pressure
  einsum    bsc,chd->bhsd as CrossAttention(bhsd) emits it

Run: python tools/perf.py attention-dots
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

B, S, DT, PEAK = 16, 3072, jnp.bfloat16, 197e12
CHAIN = 16


def report(name, dt, flops):
    print(f"{name:34s} {dt*1e3:8.3f} ms   mfu {flops/dt/PEAK*100:5.1f}%",
          flush=True)


def time_chained(build, flops, iters=3):
    """build(x, w) -> y with y feeding the next iteration's x role."""

    @jax.jit
    def chained(x, w):
        def body(i, h):
            return build(h, w)

        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, x).astype(
            jnp.float32))

    return chained


def run(name, chained, x, w, flops):
    np.asarray(chained(x, w))
    t0 = time.perf_counter()
    for _ in range(3):
        out = chained(x, w)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 3 / CHAIN
    report(name, dt, flops)


def main():
    print("devices:", jax.devices(), flush=True)
    for C in (320, 640):
        s = S if C == 320 else S // 4
        H, D = C // 64, 64
        x = jnp.zeros((B, s, C), DT)
        w = jnp.zeros((C, C), DT)
        flops = 2 * B * s * C * C
        print(f"--- C={C}, S={s}", flush=True)

        run("3d dot (B,S,C)x(C,C)",
            time_chained(lambda h, w_: jnp.einsum("bsc,co->bso", h, w_),
                         flops), x, w, flops)

        run("2d dot (B*S,C)x(C,C)",
            time_chained(
                lambda h, w_: (h.reshape(B * s, C) @ w_).reshape(B, s, C),
                flops), x, w, flops)

        # q-projection einsum to head-major, folded back so it chains
        run("einsum bsc,chd->bhsd (+fold)",
            time_chained(
                lambda h, w_: jnp.einsum(
                    "bhsd,hdc->bsc",
                    jnp.einsum("bsc,chd->bhsd", h,
                               w_.reshape(C, H, D)),
                    w_.reshape(H, D, C)) * 0.5,
                2 * flops), x, w, 2 * flops)

        # same contraction as a 1x1 conv on the spatial NHWC tensor
        # (the resnet convs run ~70% MFU in-graph; if this holds, the
        # projections should be emitted as convs, not dots)
        hh, ww = (64, 48) if C == 320 else (32, 24)
        xs = jnp.zeros((B, hh, ww, C), DT)
        wc = jnp.zeros((1, 1, C, C), DT)

        def conv1x1(h, w_):
            dn = jax.lax.conv_dimension_numbers(
                h.shape, w_.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                h, w_, (1, 1), "VALID", dimension_numbers=dn)

        run("1x1 conv NHWC", time_chained(conv1x1, flops), xs, wc, flops)

        # f32 accumulate output (rules out the bf16-output path)
        run("2d dot -> f32",
            time_chained(
                lambda h, w_: jax.lax.dot(
                    h.reshape(B * s, C), w_,
                    preferred_element_type=jnp.float32).astype(DT)
                .reshape(B, s, C), flops), x, w, flops)

        # FF-shaped pair: C -> 8C -> C (the GEGLU/out dots)
        w_up = jnp.zeros((C, 8 * C), DT)
        w_dn = jnp.zeros((8 * C, C), DT)
        ff_flops = 2 * B * s * C * 8 * C * 2

        @jax.jit
        def ff_chained(h, w_u, w_d):
            def body(i, hh_):
                return (hh_.reshape(B * s, C) @ w_u @ w_d).reshape(
                    B, s, C)

            return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, h).astype(
                jnp.float32))

        np.asarray(ff_chained(x, w_up, w_dn))
        t0 = time.perf_counter()
        for _ in range(3):
            out = ff_chained(x, w_up, w_dn)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 3 / CHAIN
        report("ff pair C->8C->C", dt, ff_flops)


if __name__ == "__main__":
    main()
