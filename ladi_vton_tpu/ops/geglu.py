"""Fused GEGLU feed-forward: x @ W1 -> split -> h * gelu(g) -> @ W2.

The transformer FF in the UNet (reference consumes it inside diffusers'
Transformer2DModel; our module is ``models.layers.FeedForwardGEGLU``)
expands to 2*4*C channels, gates, and projects back.  XLA materializes
the (rows, 8C) projection in HBM between the two matmuls — at the UNet's
level-0 shape (rows = 16*3072, C = 320) that is ~500 MB of round-trip
traffic and the measured op runs at ~30% MFU (tools/perf.py transformer-internals; docs/PERF.md §1).

This kernel tiles over row blocks and keeps both weight matrices
resident in VMEM: per block it computes the expansion, the exact-erf
gelu gate, and the contraction without the intermediate ever leaving
VMEM.  HBM traffic drops to one read of x + one write of y + one read
of the weights.

Backward recomputes through the XLA oracle under ``jax.custom_vjp``
(same strategy as ``ops.flash_attention``) — training numerics are the
oracle's, and the fused path stays inference-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — exact at
    float32 resolution).  ``lax.erf`` has no Pallas TPU lowering, so the
    kernel carries its own."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def geglu_xla(x, w1, b1, w2, b2):
    """Oracle / CPU path: plain XLA, exact-erf gelu."""
    proj = jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
    h, gate = jnp.split(proj, 2, axis=-1)
    g32 = gate.astype(jnp.float32)
    a = h * (0.5 * g32 * (1.0 + jax.lax.erf(g32 * (2.0 ** -0.5)))
             ).astype(x.dtype)
    return jnp.dot(a, w2.astype(x.dtype)) + b2.astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    proj = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    inner = proj.shape[1] // 2
    h = proj[:, :inner]
    g = proj[:, inner:]
    a = (h * _gelu_exact(g)).astype(x.dtype)
    y = jax.lax.dot_general(
        a, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _geglu_fwd_impl(x, w1, b1, w2, b2, block_r: int, interpret: bool):
    orig_shape = x.shape
    C = x.shape[-1]
    I2 = w1.shape[1]
    xf = x.reshape(-1, C)
    N = xf.shape[0]
    np_ = (N + block_r - 1) // block_r * block_r
    if np_ != N:
        xf = jnp.pad(xf, ((0, np_ - N), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, C), x.dtype),
        grid=(np_ // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, C), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I2), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I2), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I2 // 2, C), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, C), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, w1.astype(x.dtype), b1.reshape(1, -1).astype(x.dtype),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(x.dtype))

    return out[:N].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _geglu(x, w1, b1, w2, b2, block_r, interpret):
    return _geglu_fwd_impl(x, w1, b1, w2, b2, block_r, interpret)


def _geglu_fwd(x, w1, b1, w2, b2, block_r, interpret):
    return (_geglu_fwd_impl(x, w1, b1, w2, b2, block_r, interpret),
            (x, w1, b1, w2, b2))


def _geglu_bwd(block_r, interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(geglu_xla, x, w1, b1, w2, b2)
    return vjp(g)


_geglu.defvjp(_geglu_fwd, _geglu_bwd)


def geglu(x, w1, b1, w2, b2, *, block_r: int | None = None,
          impl: str = "auto"):
    """GEGLU FF over (..., C) with weights (C, 2I)/(2I,)/(I, C)/(C,).

    ``impl``: "pallas" | "xla" | "auto" (pallas when lowering for TPU).
    """
    if impl == "xla":
        return geglu_xla(x, w1, b1, w2, b2)
    if block_r is None:
        # keep the fp32 expansion tile ~<= 21 MB in VMEM
        I2 = w1.shape[1]
        block_r = 512 if I2 <= 5120 else 256
    if impl == "pallas":
        return _geglu(x, w1, b1, w2, b2, block_r,
                      jax.default_backend() != "tpu")
    # measured (tools/perf.py geglu (docs/PERF.md §3)): the fused kernel only beats XLA at
    # the level-1 width (C=640) — docs/PERF.md §3; elsewhere the
    # matmuls are the limit,
    # not the HBM round-trip, and XLA ties or edges ahead
    if x.shape[-1] != 640:
        return geglu_xla(x, w1, b1, w2, b2)
    return jax.lax.platform_dependent(
        x, w1, b1, w2, b2,
        tpu=lambda *a: _geglu(*a, block_r, False),
        default=lambda *a: geglu_xla(*a),
    )
