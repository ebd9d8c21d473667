"""Thin-plate-spline geometric matching module (garment warper).

TPU-first re-design of the reference's ConvNet_TPS stack
(reference: src/models/ConvNet_TPS.py):

* two strided-conv feature extractors (cloth: 3ch; agnostic: 21ch =
  masked person 3 + pose heatmaps 18, or 5ch dense) — ConvNet_TPS.py:29-55
* channelwise L2 norm + all-pairs feature correlation — :58-87
* bounded regression to a 5x5 control-point grid: tanh-activated linear
  whose bias is initialized to arctanh(target points) with zero weights,
  so the identity warp is the starting point — :193-201
* TPS solve: the (N+3)x(N+3) radial-basis kernel is inverted once at
  construction (host-side, tiny) and the dense warp grid is two matmuls
  at runtime — :142-190
* second-difference row/column regularizers returned as 6 scalars
  (rx, ry, cx, cy, rg, cg) — :203-284.

The correlation's channel ordering follows the reference exactly
(A-positions flattened width-major) so published torch weights convert
verbatim.  BatchNorm uses flax's cross-batch stats; under a data mesh,
pass ``axis_name='data'`` to sync stats across replicas — the torch
reference runs unsynced per-GPU BN, so unsynced is also accepted.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _tps_radial_np(dist_sq: np.ndarray) -> np.ndarray:
    """U(r) = r^2 log r = 0.5 * d2 * log(d2), with U(0) = 0."""
    safe = np.where(dist_sq == 0.0, 1.0, dist_sq)
    return np.where(dist_sq == 0.0, 0.0, 0.5 * safe * np.log(safe))


def make_control_points(grid_size: int = 5, span: float = 0.9) -> np.ndarray:
    """(N, 2) xy control points on a regular grid in [-span, span]."""
    axis = np.linspace(-span, span, grid_size)
    yy, xx = np.meshgrid(axis, axis, indexing="ij")  # row-major like itertools.product
    return np.stack([xx.ravel(), yy.ravel()], axis=-1).astype(np.float32)


def tps_inverse_kernel(control_points: np.ndarray) -> np.ndarray:
    """Invert the padded TPS system matrix — once at init, on host, in
    float64 (the reference solves with torch.inverse at construction,
    ConvNet_TPS.py:161)."""
    cp = control_points.astype(np.float64)
    N = cp.shape[0]
    d2 = np.sum((cp[:, None, :] - cp[None, :, :]) ** 2, axis=-1)
    K = _tps_radial_np(d2)
    P = np.concatenate([np.ones((N, 1)), cp], axis=1)  # (N, 3)
    forward = np.block([[K, P], [P.T, np.zeros((3, 3))]])
    return np.linalg.inv(forward).astype(np.float32)


def tps_coordinate_repr(
    height: int, width: int, control_points: np.ndarray
) -> np.ndarray:
    """(H*W, N+3) dense-grid representation [U(d), 1, x, y]."""
    ys = np.linspace(-1.0, 1.0, height)
    xs = np.linspace(-1.0, 1.0, width)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([gx.ravel(), gy.ravel()], axis=-1)  # (HW, 2) xy
    d2 = np.sum(
        (coords[:, None, :].astype(np.float64)
         - control_points[None, :, :].astype(np.float64)) ** 2, axis=-1
    )
    U = _tps_radial_np(d2)
    ones = np.ones((coords.shape[0], 1))
    return np.concatenate([U, ones, coords], axis=1).astype(np.float32)


class TPSGridGen:
    """Precomputed TPS solver: control-point targets -> dense warp grid."""

    def __init__(self, height: int, width: int,
                 control_points: Optional[np.ndarray] = None):
        if control_points is None:
            control_points = make_control_points()
        self.height = height
        self.width = width
        self.num_points = control_points.shape[0]
        self.control_points = control_points
        self.inverse_kernel = jnp.asarray(tps_inverse_kernel(control_points))
        self.coord_repr = jnp.asarray(
            tps_coordinate_repr(height, width, control_points)
        )

    def __call__(self, source_control_points: jax.Array) -> jax.Array:
        """(B, N, 2) source points -> (B, H, W, 2) sampling grid (xy)."""
        B = source_control_points.shape[0]
        pad = jnp.zeros((B, 3, 2), source_control_points.dtype)
        Y = jnp.concatenate([source_control_points, pad], axis=1)
        # full-precision matmuls: the TPS solve is numerically sensitive
        # (bf16 MXU default would distort the warp grid by ~1e-1)
        mapping = jnp.einsum("ij,bjk->bik",
                             self.inverse_kernel.astype(Y.dtype), Y,
                             precision=jax.lax.Precision.HIGHEST)
        coords = jnp.einsum("pi,bik->bpk",
                            self.coord_repr.astype(Y.dtype), mapping,
                            precision=jax.lax.Precision.HIGHEST)
        return coords.reshape(B, self.height, self.width, 2)


class FeatureExtraction(nn.Module):
    """4x stride-2 conv tower: (B,H,W,C) -> (B,H/16,W/16,512)."""

    ngf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def conv(features, k, s, name):
            pad = ((1, 1), (1, 1))
            return nn.Conv(features, (k, k), strides=(s, s), padding=pad,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        h = conv(self.ngf, 4, 2, "conv_0")(x.astype(self.dtype))
        h = nn.relu(h)
        h = bn("bn_0")(h)
        for i in range(self.n_layers):
            out_ch = min(2 ** (i + 1) * self.ngf, 512)
            h = conv(out_ch, 4, 2, f"conv_{i + 1}")(h)
            h = nn.relu(h)
            h = bn(f"bn_{i + 1}")(h)
        h = conv(512, 3, 1, "conv_4")(h)
        h = nn.relu(h)
        h = bn("bn_4")(h)
        h = conv(512, 3, 1, "conv_5")(h)
        h = nn.relu(h)
        return h


def feature_l2norm(feat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Channelwise L2 normalization (reference ConvNet_TPS.py:58-65)."""
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True) + eps)
    return feat / norm


def feature_correlation(feat_a: jax.Array, feat_b: jax.Array) -> jax.Array:
    """All-pairs correlation (reference ConvNet_TPS.py:68-87).

    NHWC in; returns (B, H, W, H*W) where spatial indexes B positions and
    the channel axis enumerates A positions **width-major** (the
    reference flattens A transposed: k = w_idx * H + h_idx) so converted
    regression weights see identical channel order.
    """
    B, H, W, C = feat_a.shape
    a_flat = jnp.transpose(feat_a, (0, 2, 1, 3)).reshape(B, W * H, C)
    b_flat = feat_b.reshape(B, H * W, C)
    corr = jnp.einsum("bpc,bqc->bpq", b_flat, a_flat,
                      preferred_element_type=jnp.float32)
    return corr.reshape(B, H, W, W * H).astype(feat_a.dtype)


class FeatureRegression(nn.Module):
    """conv-BN-ReLU x4 + flatten + linear -> tanh control-point offsets.

    The linear layer is zero-weight / arctanh(target)-bias initialized so
    tanh(linear(.)) starts at the identity warp
    (reference ConvNet_TPS.py:193-201).
    """

    output_dim: int = 50
    target_bias: Optional[np.ndarray] = None  # (output_dim,) arctanh targets
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        h = nn.Conv(512, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_0")(x.astype(self.dtype))
        h = nn.relu(bn("bn_0")(h))
        h = nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_1")(h)
        h = nn.relu(bn("bn_1")(h))
        h = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_2")(h)
        h = nn.relu(bn("bn_2")(h))
        h = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_3")(h)
        h = nn.relu(bn("bn_3")(h))
        # flatten in torch NCHW order (C, H, W) so linear weights convert
        B = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(B, -1)
        if self.target_bias is not None:
            bias_init = lambda key, shape, dtype: jnp.asarray(
                self.target_bias, dtype
            )
        else:
            bias_init = nn.initializers.zeros
        h = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=bias_init, name="linear")(h)
        return jnp.tanh(h)


def grid_regularization_losses(coor: jax.Array, grid_size: int = 5):
    """Second-difference + collinearity regularizers on control points.

    Vectorized form of reference ConvNet_TPS.py:203-284.  ``coor`` is
    (B, N, 2) with points ordered row-major (row = constant y).  Returns
    (rx, ry, cx, cy, rg, cg) scalars:
    * row/col: |Δ²| of squared consecutive differences, floored at 0.08
      elementwise then averaged (rx_loss etc., reference :216-221)
    * rg/cg: summed collinearity cross-products of consecutive triples
      (first batch element only, as in reference :264-284), floored at
      0.02 (reference :212-213).
    """
    g = grid_size
    B = coor.shape[0]
    pts = coor.reshape(B, g, g, 2)

    def second_diff(p):  # p: (B, g, g, 2) along axis 2 (within a line)
        diff = (p[:, :, 1:, :] - p[:, :, :-1, :]) ** 2  # (B,g,g-1,2)
        sec = jnp.abs(diff[:, :, 1:, :] - diff[:, :, :-1, :])  # (B,g,g-2,2)
        return sec.reshape(B, -1, 2)

    row = second_diff(pts)  # rows: consecutive x-neighbors
    col = second_diff(jnp.transpose(pts, (0, 2, 1, 3)))

    floor = jnp.asarray(0.08, coor.dtype)
    rx = jnp.mean(jnp.maximum(floor, row[..., 0]))
    ry = jnp.mean(jnp.maximum(floor, row[..., 1]))
    cx = jnp.mean(jnp.maximum(floor, col[..., 0]))
    cy = jnp.mean(jnp.maximum(floor, col[..., 1]))

    def collinearity(p):  # (g, g, 2) single batch element
        p0 = p[:, :-2]
        p1 = p[:, 1:-1]
        p2 = p[:, 2:]
        cross = jnp.abs(
            (p1[..., 1] - p0[..., 1]) * (p1[..., 0] - p2[..., 0])
            - (p1[..., 1] - p2[..., 1]) * (p1[..., 0] - p0[..., 0])
        )
        return jnp.sum(cross)

    rg = jnp.maximum(collinearity(pts[0]), jnp.asarray(0.02, coor.dtype))
    cg = jnp.maximum(collinearity(jnp.transpose(pts[0], (1, 0, 2))),
                     jnp.asarray(0.02, coor.dtype))
    return rx, ry, cx, cy, rg, cg


class ConvNetTPS(nn.Module):
    """Full geometric matching module.

    ``__call__(cloth, agnostic)`` -> (grid (B,H,W,2), control points,
    rx, ry, cx, cy, rg, cg) — same contract as reference
    ConvNet_TPS.forward (ConvNet_TPS.py:321-337).
    """

    height: int = 256
    width: int = 192
    input_nc_b: int = 21
    grid_size: int = 5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cp = make_control_points(self.grid_size)
        self.grid_gen = TPSGridGen(self.height, self.width, cp)
        self.extractionA = FeatureExtraction(dtype=self.dtype,
                                             param_dtype=self.param_dtype)
        self.extractionB = FeatureExtraction(dtype=self.dtype,
                                             param_dtype=self.param_dtype)
        self.regression = FeatureRegression(
            output_dim=self.grid_size * self.grid_size * 2,
            target_bias=np.arctanh(cp).reshape(-1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, cloth: jax.Array, agnostic: jax.Array,
                 *, train: bool = False):
        feat_a = feature_l2norm(self.extractionA(cloth, train=train))
        feat_b = feature_l2norm(self.extractionB(agnostic, train=train))
        corr = feature_correlation(feat_a, feat_b)
        points = self.regression(corr, train=train)
        coor = points.reshape(points.shape[0], -1, 2)
        rx, ry, cx, cy, rg, cg = grid_regularization_losses(
            coor, self.grid_size
        )
        grid = self.grid_gen(coor)
        return grid, coor, rx, ry, cx, cy, rg, cg
