"""Fused LayerNorm as a Pallas TPU kernel.

The UNet's transformer blocks run three LayerNorms per block over
(B, S, C) activations (reference executes these inside diffusers'
BasicTransformerBlock, src/train_vto.py:259-277 pulls that UNet in
verbatim).  The round-2 device trace attributed ~3.2 ms of every
~79 ms CFG-16 UNet step to LN reduce instructions plus their fp32
upcast materialization (docs/PERF.md §6) — LayerNorm is pure
bandwidth, so the fused single-pass kernel (ONE bf16 HBM read + ONE
write, fp32 math in VMEM) is the memory-bound optimum.

Unlike GroupNorm (per-channel stats, lane layout untouched), LN
reduces ACROSS the channel/lane axis per row.  Mosaic lowers
``jnp.mean(..., axis=-1)`` on the logical shape with padded lanes
masked, so C need not be a multiple of 128 (UNet widths are
320/640/1280).  The XLA fallback is the numerics oracle, the CPU
path, and the backward (custom_vjp recompute), mirroring
``ops.group_norm``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm_xla(x, scale, bias, *, eps: float = 1e-5):
    """Reference LayerNorm over the last axis, fp32 stats."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (T, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * scale_ref[0] + bias_ref[0]
    out_ref[...] = out.astype(out_ref.dtype)


def _row_tile(n: int, c: int, target_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest divisor of ``n`` (multiple of 8, bf16 tile under
    ``target_bytes``) — big tiles amortize per-grid-step DMA setup."""
    cap = max(8, target_bytes // (c * 2))
    best = 0
    i = 1
    while i * i <= n:
        if n % i == 0:
            for d in (i, n // i):
                if d % 8 == 0 and d <= cap and d > best:
                    best = d
        i += 1
    return best


def layer_norm_pallas(x, scale, bias, *, eps: float = 1e-5,
                      interpret: bool = False):
    """Single-pass fused LN for (..., C) inputs (rows flattened)."""
    orig_shape = x.shape
    C = x.shape[-1]
    xr = x.reshape(-1, C)
    N = xr.shape[0]
    T = _row_tile(N, C)
    if not T or N % T:
        return layer_norm_xla(x, scale, bias, eps=eps)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},  # normalize in place
        interpret=interpret,
    )(xr, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_pallas_diff(x, scale, bias, eps, interpret):
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    return layer_norm_pallas(x, scale, bias, eps=eps, interpret=interpret)


def _ln_pallas_fwd(x, scale, bias, eps, interpret):
    return (layer_norm_pallas(x, scale, bias, eps=eps,
                              interpret=interpret),
            (x, scale, bias))


def _ln_pallas_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: layer_norm_xla(x_, s_, b_, eps=eps),
        x, scale, bias)
    return vjp(g)


_ln_pallas_diff.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)


def layer_norm(x, scale, bias, *, eps: float = 1e-5, impl: str = "auto"):
    """Dispatch: Pallas kernel when lowering for TPU, XLA elsewhere.

    Platform is resolved at LOWERING time via
    ``jax.lax.platform_dependent`` (same rationale as ``ops.group_norm``:
    CPU-pinned programs must never pick the TPU kernel, and host-side
    backend queries can fault when the TPU runtime is down).  Narrow
    (<128-lane) rows stay on XLA where the kernel would be mostly
    padding.
    """
    xla_fn = functools.partial(layer_norm_xla, eps=eps)
    if impl == "xla":
        return xla_fn(x, scale, bias)
    if impl == "pallas":  # forced (tests): interpret off-TPU
        return _ln_pallas_diff(x, scale, bias, eps,
                               jax.default_backend() != "tpu")
    C = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if C < 128 or rows % 8:
        return xla_fn(x, scale, bias)
    return jax.lax.platform_dependent(
        x, scale, bias,
        tpu=lambda x_, s_, b_: _ln_pallas_diff(x_, s_, b_, eps, False),
        default=xla_fn)
