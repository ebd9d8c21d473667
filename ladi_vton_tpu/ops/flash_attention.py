"""Pallas TPU flash-attention (forward) with recompute backward.

TPU-native replacement for the xformers attention the reference enables
(reference: src/train_vto.py:284-288).  Blockwise online-softmax over KV
chunks: per (batch*head, q-block) grid cell the kernel streams KV tiles
from VMEM, carrying running max / normalizer / weighted accumulator, so
the (Sq, Sk) score matrix never touches HBM.

Sequence geometry in this framework is short-to-medium (UNet self-attn at
512x384 peaks at Sq = Sk = 3072, D = 64; cross-attn Sk = 77), so full K/V
slices for one (batch, head) comfortably fit VMEM and the kernel blocks
only the score/probability tiles.  The backward pass recomputes attention
with the XLA oracle under ``jax.custom_vjp`` — at these sizes the
recompute is cheaper than a dedicated bwd kernel and keeps training
numerics trivially correct.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladi_vton_tpu.ops.attention import xla_attention

_NEG_INF = float(-1e30)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                scale: float):
    """One (batch*head, q_block) cell. Refs: q (1,bq,D), k/v (1,Skp,D).

    Both dots take the INPUT dtype (bf16 in production) with fp32
    accumulation — the MXU's native mode, and the same recipe as the
    ``xla_attention`` oracle (bf16 operands, ``preferred_element_type``
    fp32, probs cast back to the value dtype).  Measured A/B at the hot
    UNet shape (80x3072x64, PERF.md §12): this is a TIE with the old
    explicit-fp32-upcast recipe — Mosaic already lowered the upcast
    dots to native bf16 MXU passes, and the outputs are bit-identical.
    We keep the input-dtype form because it states the intent directly
    instead of relying on that folding, and because applying the scale
    in fp32 on the (bq, block_k) score tile (the third variant A/B'd)
    measurably LOSES ~60%.  The softmax chain (max, exp, rescale) stays
    in fp32.  The padding mask is compile-time skipped when the KV
    length is already a block multiple (every hot UNet shape:
    3072/768/192 self-attn; cross-attn Sk=77 pads to 128 and keeps the
    mask).
    """
    # scale q up front in its own dtype: the hot D=64 gives scale=0.125,
    # an exact power of two, so bf16 scaling is lossless and avoids a
    # (bq, block_k)-sized fp32 multiply on every score tile
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # (bq, D)
    bq = q.shape[0]
    d = q.shape[1]
    skp = k_ref.shape[1]
    num_kv_blocks = skp // block_k
    masked = kv_len < skp

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, block_k) fp32
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            valid = (col + i * block_k) < kv_len
            s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_fin, acc_fin = jax.lax.fori_loop(0, num_kv_blocks, body,
                                          (m0, l0, acc0))
    o_ref[0] = (acc_fin / l_fin).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale: float, block_q: int, block_k: int,
                    interpret: bool, bhsd: bool = False) -> jax.Array:
    if bhsd:
        B, H, Sq, D = q.shape
        Sk = k.shape[2]
    else:
        B, Sq, H, D = q.shape
        Sk = k.shape[1]
    sqp = _round_up(Sq, block_q)
    skp = _round_up(Sk, block_k)

    # -> (B*H, S, D); pad sequence to block multiples.  In bhsd mode
    # the reshape is layout-free (no transpose): the caller produced
    # q/k/v head-major straight out of the projection einsum, so XLA
    # emits no relayout copy before the kernel.
    def fold(x, sp):
        if not bhsd:
            x = jnp.swapaxes(x, 1, 2)
        x = x.reshape(B * H, x.shape[2], D)
        if sp != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, sp - x.shape[1]), (0, 0)))
        return x

    qf, kf, vf = fold(q, sqp), fold(k, skp), fold(v, skp)

    grid = (B * H, sqp // block_q)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=Sk, block_k=block_k,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, sqp, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        # full-KV blocks at S=3072 need ~27MB scoped VMEM; v5e has 128MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :Sq].reshape(B, H, Sq, D)
    if bhsd:
        return out
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, block_q, block_k, interpret, bhsd=False):
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret,
                           bhsd)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret, bhsd=False):
    return (_flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret,
                            bhsd), (q, k, v))


def _flash_bwd(scale, block_q, block_k, interpret, bhsd, res, g):
    q, k, v = res

    def oracle(q_, k_, v_):
        if bhsd:
            perm = (0, 2, 1, 3)
            return jnp.transpose(
                xla_attention(jnp.transpose(q_, perm),
                              jnp.transpose(k_, perm),
                              jnp.transpose(v_, perm), scale=scale), perm)
        return xla_attention(q_, k_, v_, scale=scale)

    _, vjp = jax.vjp(oracle, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


# module-level default so whole-model A/B probes can sweep the block
# size without re-plumbing every call site.  Full-UNet sweep (CFG-16
# step): 1024 -> 80.80 ms vs 512 -> 82.36 ms; 256/768/1536 all lose to
# 1024 (docs/PERF.md §1).
DEFAULT_BLOCK_Q = 1024


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    bhsd: bool = False,
) -> jax.Array:
    """Flash attention over (B, S, H, D) tensors. Non-causal.

    ``bhsd=True`` takes/returns (B, H, S, D) head-major tensors —
    produced directly by a projection einsum — so no transpose (and no
    XLA relayout copy) sits between the matmuls and the kernel.

    Default blocks are tuned for the UNet's hot shape (Sq=Sk=3072,
    D=64, measured on v5e — tools/perf.py attention-tuning; docs/PERF.md §1): q-blocks of 512 and
    the FULL KV slice per block when it fits VMEM (<= 4096 rows), which
    skips the online-softmax rescale chain entirely inside the loop.
    (256, 256) ran at 13% MFU; (512, full) at 32%.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q
    Sq = q.shape[2] if bhsd else q.shape[1]
    Sk = k.shape[2] if bhsd else k.shape[1]
    skp = _round_up(Sk, 128)
    if block_k is None:
        # full-KV single pass when the score tile stays within VMEM;
        # blockwise streaming beyond that
        block_k = skp if skp <= 4096 else 1024
    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, skp)
    return _flash(q, k, v, float(scale), block_q, block_k, interpret,
                  bhsd)
