"""Bilinear grid sampling (the TPS warp apply).

The reference warps garments with ``F.grid_sample(cloth, grid,
padding_mode='border')`` (reference: src/inference.py:260,
src/train_tps.py:122,186,194,266).  JAX has no built-in; this is a
TPU-friendly reformulation: the bilinear sample is four gathers over a
flattened spatial axis plus a weighted sum — all static shapes, fully
differentiable w.r.t. both image and grid (needed by train_tps, where the
warp grid is the TPS network output).

Layout is NHWC.  Coordinate convention matches torch: ``grid[..., 0]`` is
x in [-1, 1] over width, ``grid[..., 1]`` is y over height;
``align_corners=False`` maps -1/+1 to the outer pixel *edges*
(half-pixel centers), ``align_corners=True`` maps them to the outer pixel
centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    *,
    padding_mode: str = "border",
    align_corners: bool = False,
) -> jax.Array:
    """Sample ``image`` (B,H,W,C) at ``grid`` (B,Hg,Wg,2) locations.

    Returns (B,Hg,Wg,C).  ``padding_mode`` in {"border", "zeros"}.
    """
    if image.ndim != 4 or grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(f"bad shapes: image {image.shape}, grid {grid.shape}")
    B, H, W, C = image.shape
    compute_dtype = jnp.promote_types(grid.dtype, jnp.float32)

    x = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":
        # validity before clamping; out-of-range corners contribute zero
        def valid(xi, yi):
            return (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ).astype(compute_dtype)

        v00, v01 = valid(x0i, y0i), valid(x1i, y0i)
        v10, v11 = valid(x0i, y1i), valid(x1i, y1i)
    elif padding_mode == "border":
        v00 = v01 = v10 = v11 = None
    else:
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    # one flattened gather per corner: (B, H*W, C) indexed by (B, Hg*Wg)
    flat = image.reshape(B, H * W, C)

    def gather(yc, xc):
        idx = (yc * W + xc).reshape(B, -1)  # (B, Hg*Wg)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    g00 = gather(y0c, x0c)
    g01 = gather(y0c, x1c)
    g10 = gather(y1c, x0c)
    g11 = gather(y1c, x1c)

    w00 = ((1 - wx) * (1 - wy)).reshape(B, -1, 1).astype(compute_dtype)
    w01 = (wx * (1 - wy)).reshape(B, -1, 1).astype(compute_dtype)
    w10 = ((1 - wx) * wy).reshape(B, -1, 1).astype(compute_dtype)
    w11 = (wx * wy).reshape(B, -1, 1).astype(compute_dtype)

    if padding_mode == "zeros":
        w00 = w00 * v00.reshape(B, -1, 1)
        w01 = w01 * v01.reshape(B, -1, 1)
        w10 = w10 * v10.reshape(B, -1, 1)
        w11 = w11 * v11.reshape(B, -1, 1)

    out = (
        g00.astype(compute_dtype) * w00
        + g01.astype(compute_dtype) * w01
        + g10.astype(compute_dtype) * w10
        + g11.astype(compute_dtype) * w11
    )
    Hg, Wg = grid.shape[1], grid.shape[2]
    return out.reshape(B, Hg, Wg, C).astype(image.dtype)
