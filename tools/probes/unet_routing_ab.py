"""Perf probe 11: whole-UNet A/B of kernel routing choices.

Standalone kernel probes ignore fusion-boundary effects: every pallas
call forces layout copies and blocks XLA fusion across it (the trace
shows 6.8 ms/step of copies + 22.8 ms/step inside pallas).  The only
honest comparison is the full UNet step.  Variants:

  base         current routing (pallas GN one-pass, flash attn, geglu@640)
  gn-xla       GroupNorm forced to XLA everywhere
  geglu-xla    GEGLU forced to XLA everywhere
  both-xla     both forced to XLA
  ln-pallas    transformer LayerNorms forced to the fused Pallas kernel
               (default is XLA — flip models/layers.py
               BasicTransformerBlock.ln_impl only on a win here)

Run: python tools/perf.py unet-routing-ab
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, DT, PEAK = 16, jnp.bfloat16, 197e12

import ladi_vton_tpu.ops.geglu as geglu_mod
import ladi_vton_tpu.ops.group_norm as gn_mod
from ladi_vton_tpu.models.unet_condition import (
    UNet2DCondition,
    sd2_unet_config,
)

_orig_gn = gn_mod.group_norm
_orig_geglu = geglu_mod.geglu

import ladi_vton_tpu.ops.layer_norm as ln_mod  # noqa: E402

_orig_ln = ln_mod.layer_norm

import ladi_vton_tpu.models.layers as layers_mod  # noqa: E402
import ladi_vton_tpu.ops.attention as attn_mod  # noqa: E402

_orig_big_band = gn_mod._ONE_PASS_BIG_BAND


def set_variant(gn_xla: bool, geglu_xla: bool, ln_pallas: bool = False,
                gn_hires_xla: bool = False, bhsd_cap=None,
                xla_long_kv=None):
    gn_mod.group_norm = (functools.partial(_orig_gn, impl="xla")
                         if gn_xla else _orig_gn)
    geglu_mod.geglu = (geglu_mod.geglu_xla if geglu_xla else _orig_geglu)
    # call sites pass impl= explicitly (BasicTransformerBlock default
    # "xla"), so the override must drop the incoming impl kwarg
    ln_mod.layer_norm = (
        (lambda x, s, b, *, eps=1e-5, impl=None:
         _orig_ln(x, s, b, eps=eps, impl="pallas"))
        if ln_pallas else _orig_ln)
    # per-resolution knobs (PERF.md §12 layout-copy attack): narrow the
    # one-pass big band so the 15.7M-elem 64x48 UNet slab routes to the
    # lane-preserving XLA GN; cap bhsd / force XLA attention at S=3072
    gn_mod._ONE_PASS_BIG_BAND = ((8_400_000, 8_400_000) if gn_hires_xla
                                 else _orig_big_band)
    layers_mod.BHSD_SEQ_CAP = bhsd_cap
    attn_mod.XLA_LONG_KV = xla_long_kv


def time_unet():
    unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
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
    variants = [
        ("base", {}),
        ("gn-hires-xla", dict(gn_hires_xla=True)),
        ("attn-plain-hires", dict(bhsd_cap=1024)),
        ("attn-xla-hires", dict(xla_long_kv=3072)),
        ("gn-hires+attn-plain", dict(gn_hires_xla=True, bhsd_cap=1024)),
        ("gn-hires+attn-xla", dict(gn_hires_xla=True, xla_long_kv=3072)),
        ("gn-xla", dict(gn_xla=True)),
        ("geglu-xla", dict(geglu_xla=True)),
        ("ln-pallas", dict(ln_pallas=True)),
    ]
    only = os.environ.get("ROUTING_AB_ONLY")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, kw in variants:
        set_variant(kw.pop("gn_xla", False), kw.pop("geglu_xla", False),
                    kw.pop("ln_pallas", False), **kw)
        dt = time_unet()
        mfu = 0.575e12 * B / dt / PEAK
        print(f"{name:20s} {dt*1e3:7.2f} ms  mfu {mfu*100:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
