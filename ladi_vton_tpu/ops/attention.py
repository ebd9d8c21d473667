"""Scaled dot-product attention with a Pallas TPU fast path.

The reference opts into xformers memory-efficient attention for the UNet
(reference: src/train_vto.py:284-288, src/inference.py:143-147).  The
TPU-native equivalent is a Pallas flash-attention kernel
(``ops.flash_attention``) that streams KV blocks through VMEM and never
materializes the (Sq, Sk) score matrix in HBM.  It is default-on for the
UNet's self/cross attention; the XLA einsum path remains as the numerics
oracle, the CPU/test path, and the causal path (CLIP text encoder, 77
tokens, where a kernel buys nothing).

All shapes are (B, S, H, D) — batch, sequence, heads, head_dim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference attention: einsum + softmax in fp32."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        logits = jnp.where(col <= row, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# short sequences route to XLA: the flash custom-call's fixed layout
# boundary costs more than it saves below this KV length (cross-attn
# Sk=77 and the UNet mid block Sk=48; full-UNet sweep in docs/PERF.md)
XLA_SHORT_KV = 128

# route kv_seq >= this to XLA as well (None = never).  Probe knob for
# per-resolution A/Bs: at the hi-res UNet blocks the flash custom
# call's layout constraint forces relayout copies on its operands
# (docs/PERF.md §12), which XLA attention would not pay.
XLA_LONG_KV: Optional[int] = None

# Tensor-parallel shard_map routing (parallel/tp.py).  Under GSPMD
# auto-partitioning the Pallas flash custom call is opaque: with the
# qkv projections column-sharded over the ``model`` mesh axis, XLA
# would all-gather the head-sharded activations to run the kernel
# replicated.  Heads are independent in attention, so when this knob
# holds the 2D mesh the dispatch instead runs per-shard under
# ``jax.shard_map`` — each chip executes the flash kernel on its own
# heads, zero collectives (the head axis splits over ``model``, the
# batch over ``data``).  Falls back to the global GSPMD path whenever
# the head or batch axis does not divide the mesh (SD-2 level 0 has 5
# heads — parallel/tp.py docstring).  Set by the CLIs' TP wiring; a
# compile-time routing knob in the same idiom as XLA_LONG_KV above.
TP_SHARD_MESH = None  # Optional[jax.sharding.Mesh]


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
    bhsd: bool = False,
) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU (non-causal), XLA otherwise.

    ``auto`` picks per LOWERING platform via
    ``jax.lax.platform_dependent`` — never by querying ``jax.devices()``
    at trace time, so a computation pinned to CPU devices (virtual-mesh
    dryruns) takes the XLA path even when a TPU backend exists, and a
    broken TPU runtime is never touched from host-side dispatch.

    ``bhsd=True``: tensors are head-major (B, H, S, D) — straight out
    of a projection einsum, so the flash path needs no relayout; the
    XLA oracle path transposes internally (numerics only).
    """

    def xla_any(q_, k_, v_):
        if bhsd:
            perm = (0, 2, 1, 3)
            return jnp.transpose(
                xla_attention(jnp.transpose(q_, perm),
                              jnp.transpose(k_, perm),
                              jnp.transpose(v_, perm),
                              causal=causal, scale=scale), perm)
        return xla_attention(q_, k_, v_, causal=causal, scale=scale)

    if impl == "xla":
        return xla_any(q, k, v)

    mesh = TP_SHARD_MESH
    if mesh is not None and impl == "auto" and not causal:
        from jax.sharding import PartitionSpec as P

        axes = dict(mesh.shape)
        tp, dp = axes.get("model", 1), axes.get("data", 1)
        h_ax = 1 if bhsd else 2
        if (tp > 1 and q.shape[h_ax] % tp == 0 and q.shape[0] % dp == 0
                and k.shape[h_ax] % tp == 0):
            spec = (P("data", "model", None, None) if bhsd
                    else P("data", None, "model", None))
            inner = functools.partial(dot_product_attention, causal=False,
                                      scale=scale, impl="tp_shard_body",
                                      bhsd=bhsd)
            return jax.shard_map(inner, mesh=mesh, in_specs=(spec,) * 3,
                                 out_specs=spec)(q, k, v)

    if impl == "tp_shard_body":
        impl = "auto"  # per-shard body: normal routing, no re-wrap
    if impl in ("auto", "pallas"):
        from ladi_vton_tpu.ops.flash_attention import flash_attention

        if impl == "pallas":  # forced (tests): interpret off-TPU
            return flash_attention(
                q, k, v, scale=scale, bhsd=bhsd,
                interpret=jax.default_backend() != "tpu")
        kv_seq = k.shape[2] if bhsd else k.shape[1]
        if (causal or kv_seq <= XLA_SHORT_KV
                or (XLA_LONG_KV is not None and kv_seq >= XLA_LONG_KV)):
            # causal (CLIP text) and short-KV cross-attention (77 text
            # tokens) run faster through XLA than the flash kernel
            # (0.56 vs 0.88 ms at Sq=3072 — tools/perf.py transformer-internals; docs/PERF.md §1)
            return xla_any(q, k, v)
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=lambda q_, k_, v_: flash_attention(q_, k_, v_,
                                                   scale=scale,
                                                   bhsd=bhsd),
            default=xla_any,
        )
    raise ValueError(f"unknown attention impl: {impl!r}")
