"""Fused GroupNorm + SiLU as Pallas TPU kernels.

SURVEY.md §2.4 maps the reference's cuDNN GroupNorm/SiLU onto "fused
conv+GroupNorm+SiLU Pallas kernels for the VAE/EMASC hot path".  The
norm+activation pair is bandwidth-bound: fusing them guarantees exactly
two HBM passes (one stats pass, one normalize+silu pass) independent of
what XLA decides to fuse around them.

Two kernels over an NHWC tensor reshaped to (B, HW, C):

* stats: grid (B, row-tiles); accumulates per-channel sum / sumsq into a
  (B, 2, C) output (TPU grids run sequentially, so revisiting the same
  output block accumulates safely);
* apply: grid (B, row-tiles); normalizes with per-group mean/rstd
  (expanded to channels host-side — tiny), applies affine + SiLU.

Channel counts in the VAE/UNet are 128..1280 (lanes hold channels; 320
is fine — Mosaic masks the padded lanes and stats stay exact because
they accumulate per-channel), rows tile at 512.  The XLA fallback
(`group_norm_xla`) is the numerics oracle and the CPU path;
`group_norm` dispatches and is differentiable (custom_vjp recomputes
the backward through the oracle).  The towers consume this through
``models.layers.GroupNorm(act=...)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_xla(x, scale, bias, *, num_groups=32, eps=1e-6, act="silu"):
    """XLA GroupNorm[+SiLU], lane-preserving formulation.

    The naive form — reshape NHWC to (B, N, G, C/G) and reduce over
    (N, C/G) — splits the channel (lane) axis down to C/G=4-wide lanes
    in fp32, which on TPU materializes hugely padded relayout copies:
    the round-3 device trace attributed ~60 ms/stage of copy+reshape
    and ~30 ms of convert+reduce in the VAE encoder/decoder to exactly
    this (docs/PERF.md §10).  Instead: reduce over N per-channel (lane
    layout untouched), combine groups on the tiny (B, C) tensor, and
    apply as one per-channel affine elementwise pass that XLA fuses
    into the neighbouring ops.  Single-pass sum/sumsq variance — the
    same formulation as the Pallas kernel.
    """
    B = x.shape[0]
    C = x.shape[-1]
    cg = C // num_groups
    orig_shape = x.shape
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    n_rows = xf.shape[1]
    ch_sum = jnp.sum(xf, axis=1)      # (B, C)
    ch_sq = jnp.sum(xf * xf, axis=1)  # (B, C)
    count = n_rows * cg
    g_mean = ch_sum.reshape(B, num_groups, cg).sum(-1) / count  # (B, G)
    g_sq = ch_sq.reshape(B, num_groups, cg).sum(-1) / count
    g_var = g_sq - g_mean * g_mean
    g_rstd = jax.lax.rsqrt(g_var + eps)
    mean_c = jnp.repeat(g_mean, cg, axis=1)  # (B, C)
    rstd_c = jnp.repeat(g_rstd, cg, axis=1)
    a = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    out = xf * a[:, None, :] + b[:, None, :]
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out.reshape(orig_shape).astype(x.dtype)


def group_norm_silu_xla(x, scale, bias, *, num_groups=32, eps=1e-6):
    """Back-compat alias: fused GN+SiLU oracle."""
    return group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps,
                          act="silu")


def _one_pass_kernel(x_ref, scale_ref, bias_ref, gmap_ref, gmapt_ref,
                     out_ref, *, act: str, eps: float, count: float,
                     chunk: int):
    """Single-pass GN[+SiLU]: one (N, C) block per batch element.

    ONE x read + ONE write (the memory-bound optimum).  The bf16 slab
    sits in VMEM; compute streams ``chunk`` rows at a time so fp32
    temporaries stay small (a whole-slab fp32 cast blows the 16MB
    scoped-VMEM budget at UNet sizes).  Group reductions ride the MXU:
    per-channel sums x (C, G) one-hot map -> per-group sums; the
    (G, C) transpose map broadcasts mean/rstd back to channels.
    """
    N, C = x_ref.shape[1], x_ref.shape[2]
    nchunks = N // chunk

    def stats_body(i, carry):
        s, sq = carry
        xa = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (s + jnp.sum(xa, axis=0, keepdims=True),
                sq + jnp.sum(xa * xa, axis=0, keepdims=True))

    zero = jnp.zeros((1, C), jnp.float32)
    ch_sum, ch_sq = jax.lax.fori_loop(0, nchunks, stats_body,
                                      (zero, zero))
    gmap = gmap_ref[...]  # (C, G) one-hot
    g_sum = jax.lax.dot_general(ch_sum, gmap, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g_sq = jax.lax.dot_general(ch_sq, gmap, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mean = g_sum / count  # (1, G)
    var = g_sq / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    gmapt = gmapt_ref[...]  # (G, C)
    mean_c = jax.lax.dot_general(mean, gmapt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd, gmapt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    a = rstd_c * scale_ref[0]
    b = bias_ref[0] - mean_c * a

    def apply_body(i, _):
        xa = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        o = xa * a + b
        if act == "silu":
            o = o * jax.nn.sigmoid(o)
        out_ref[0, pl.ds(i * chunk, chunk), :] = o.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, apply_body, 0)


# the slab is normalized IN PLACE (input aliased to output) so VMEM
# holds ~2 bf16 copies (double-buffered) + chunked fp32 temps.
# Routing is by measured crossover (v5e, B=8 VAE shapes; durable
# record: docs/PERF.md §2):
#   <= 2.2M elems  : one-pass wins clearly (UNet-size slabs)
#   ~6.3M (12.6MB) : XLA edges ahead (1.53 vs 1.68 ms at 512@128x96)
#   ~12.6M (25MB)  : one-pass wins again (1.85 vs 2.42 ms at 256@256x192)
#   ~25M (50MB)    : one-pass no longer compiles (scoped-VMEM OOM)
_ONE_PASS_MAX_ELEMS = 2_200_000
_ONE_PASS_BIG_BAND = (8_400_000, 16_000_000)


def _one_pass_profitable(elems: int) -> bool:
    lo, hi = _ONE_PASS_BIG_BAND
    return elems <= _ONE_PASS_MAX_ELEMS or lo < elems <= hi


def _row_chunk(n: int) -> int:
    for c in (512, 384, 256, 128, 64, 32, 16, 8):
        if n % c == 0:
            return c
    return n


def _group_norm_pallas_one_pass(x, scale, bias, *, num_groups, eps, act,
                                interpret):
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    xr = x.reshape(B, -1, C)
    N = xr.shape[1]
    cg = C // num_groups
    eye = jnp.eye(num_groups, dtype=jnp.float32)
    gmap = jnp.repeat(eye, cg, axis=0)  # (C, G)
    gmapt = gmap.T  # (G, C)

    out = pl.pallas_call(
        functools.partial(_one_pass_kernel, act=act, eps=eps,
                          count=float(N * cg),
                          chunk=min(_row_chunk(N), N)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_groups), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},  # normalize in place
        # the default 16MB scoped-VMEM budget rejects double-buffered
        # 2M-element slabs; v5e has 128MB of VMEM — allow 100MB so the
        # 25MB VAE slabs (the profitable big band) fit too
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32), gmap, gmapt)
    return out.reshape(orig_shape)


def _stats_kernel(x_ref, out_ref):
    """Accumulate per-channel [sum, sumsq] over row tiles."""
    tile = x_ref[0].astype(jnp.float32)  # (T, C)
    s = jnp.sum(tile, axis=0, keepdims=True)
    sq = jnp.sum(tile * tile, axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0, 0:1, :] = s
        out_ref[0, 1:2, :] = sq

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0, 0:1, :] = out_ref[0, 0:1, :] + s
        out_ref[0, 1:2, :] = out_ref[0, 1:2, :] + sq


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, out_ref,
                  *, act: str):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    mean = mean_ref[0]  # (1, C)
    rstd = rstd_ref[0]
    out = (x - mean) * rstd * scale_ref[0] + bias_ref[0]
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    out_ref[0] = out.astype(out_ref.dtype)


def _largest_tile(n: int, c: int, target_bytes: int = 4 * 1024 * 1024,
                  min_tile: int = 256) -> int:
    """Largest divisor of ``n`` (multiple of 8) whose bf16 tile stays
    under ``target_bytes`` — big tiles amortize per-grid-step DMA setup
    (512-row tiles measured DMA-bound at VAE resolutions)."""
    cap = max(min_tile, target_bytes // (c * 2))
    best = 0
    i = 1
    while i * i <= n:
        if n % i == 0:
            for d in (i, n // i):
                if d % 8 == 0 and d <= cap and d > best:
                    best = d
        i += 1
    return best


def group_norm_pallas(x, scale, bias, *, num_groups=32, eps=1e-6,
                      act="silu", row_tile=None, interpret=False):
    """Fused GN[+SiLU] for NHWC (or (B, N, C)) inputs.

    Lanes hold channels; C need not be a multiple of 128 (Mosaic masks
    the padded lanes) but stats are exact because they are accumulated
    per-channel and combined per-group outside the kernel.
    """
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    xr = x.reshape(B, -1, C)
    N = xr.shape[1]
    if _one_pass_profitable(N * C):
        return _group_norm_pallas_one_pass(
            x, scale, bias, num_groups=num_groups, eps=eps, act=act,
            interpret=interpret)
    T = row_tile if row_tile else _largest_tile(N, C)
    if not T or N % T:
        # uniform tiles only; ragged shapes take the oracle
        return group_norm_xla(x, scale, bias, num_groups=num_groups,
                              eps=eps, act=act)
    tiles = N // T

    stats = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        grid=(B, tiles),
        in_specs=[pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr)

    cg = C // num_groups
    sums = stats[:, 0].reshape(B, num_groups, cg)
    sqs = stats[:, 1].reshape(B, num_groups, cg)
    count = N * cg
    g_mean = sums.sum(-1) / count                      # (B, G)
    g_var = sqs.sum(-1) / count - g_mean**2
    g_rstd = jax.lax.rsqrt(g_var + eps)
    mean_c = jnp.repeat(g_mean, cg, axis=1)[:, None, :]   # (B, 1, C)
    rstd_c = jnp.repeat(g_rstd, cg, axis=1)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr, mean_c, rstd_c,
      scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out.reshape(orig_shape)


def group_norm_silu_pallas(x, scale, bias, *, num_groups=32, eps=1e-6,
                           row_tile=512, interpret=False):
    """Back-compat alias: fused GN+SiLU kernel."""
    return group_norm_pallas(x, scale, bias, num_groups=num_groups, eps=eps,
                             act="silu", row_tile=row_tile,
                             interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_pallas_diff(x, scale, bias, num_groups, eps, act, interpret):
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    return group_norm_pallas(x, scale, bias, num_groups=num_groups, eps=eps,
                             act=act, interpret=interpret)


def _gn_pallas_fwd(x, scale, bias, num_groups, eps, act, interpret):
    out = group_norm_pallas(x, scale, bias, num_groups=num_groups, eps=eps,
                            act=act, interpret=interpret)
    return out, (x, scale, bias)


def _gn_pallas_bwd(num_groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_xla(x_, s_, b_, num_groups=num_groups,
                                          eps=eps, act=act),
        x, scale, bias)
    return vjp(g)


_gn_pallas_diff.defvjp(_gn_pallas_fwd, _gn_pallas_bwd)


def group_norm(x, scale, bias, *, num_groups=32, eps=1e-6, act="none",
               impl="auto"):
    """Dispatch: Pallas kernel when lowering for TPU, XLA oracle elsewhere.

    The platform choice is made with ``jax.lax.platform_dependent`` at
    LOWERING time — never by querying ``jax.devices()`` at trace time.
    This matters twice: (a) a computation pinned to CPU devices (the
    multi-chip dryrun's virtual mesh) must not pick the TPU kernel just
    because a TPU backend exists, and (b) touching the TPU backend from
    host-side dispatch can itself fault when the TPU runtime is broken.

    The kernel also needs C large enough that lanes aren't mostly
    padding and uniform row tiles; tiny test towers and ragged spatial
    extents take the XLA oracle, which is numerically the definition of
    this op.
    """
    xla_fn = functools.partial(group_norm_xla, num_groups=num_groups,
                               eps=eps, act=act)
    if impl == "xla":
        return xla_fn(x, scale, bias)
    if impl == "pallas":  # forced (tests): interpret off-TPU
        return _gn_pallas_diff(x, scale, bias, num_groups, eps, act,
                               jax.default_backend() != "tpu")
    C = x.shape[-1]
    N = 1
    for d in x.shape[1:-1]:
        N *= d
    # the single-pass kernel wins (one read + one write) in the
    # measured bands above; elsewhere XLA's fused GN is faster (or the
    # slab cannot compile) — see the crossover table at
    # _ONE_PASS_MAX_ELEMS / _ONE_PASS_BIG_BAND
    if C < 128 or C % num_groups or not _one_pass_profitable(N * C):
        return xla_fn(x, scale, bias)
    return jax.lax.platform_dependent(
        x, scale, bias,
        tpu=lambda x_, s_, b_: _gn_pallas_diff(x_, s_, b_, num_groups,
                                               eps, act, False),
        default=xla_fn)


def group_norm_silu(x, scale, bias, *, num_groups=32, eps=1e-6,
                    impl="auto"):
    """Back-compat alias: fused GN+SiLU dispatch."""
    return group_norm(x, scale, bias, num_groups=num_groups, eps=eps,
                      act="silu", impl=impl)
