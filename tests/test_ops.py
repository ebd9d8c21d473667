"""Ops-layer numerics tests against torch oracles (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ladi_vton_tpu.ops import (
    dilate,
    dot_product_attention,
    grid_sample,
    resize_bilinear,
)
from ladi_vton_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 13, 9, 3)).astype(np.float32)
    # grid beyond [-1, 1] to exercise padding
    grid = rng.uniform(-1.4, 1.4, size=(2, 7, 5, 2)).astype(np.float32)

    ours = grid_sample(
        jnp.asarray(img),
        jnp.asarray(grid),
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5
    )


def test_grid_sample_grad_flows():
    img = jnp.ones((1, 8, 8, 1))
    grid = jnp.zeros((1, 4, 4, 2))

    def loss(g):
        return jnp.sum(grid_sample(img * 2.0, g) ** 2)

    g = jax.grad(loss)(grid + 0.1)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("align_corners", [False])
def test_resize_bilinear_matches_torch(align_corners):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 12, 4)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (5, 7), align_corners=align_corners)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(5, 7),
        mode="bilinear",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_resize_bilinear_align_corners_true():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 10, 8, 2)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (21, 15), align_corners=True)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(21, 15),
        mode="bilinear",
        align_corners=True,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_dilate_matches_iterated_maxpool():
    rng = np.random.default_rng(3)
    m = (rng.uniform(size=(32, 24)) > 0.9).astype(np.float32)
    ours = dilate(jnp.asarray(m), kernel_size=5, iterations=5)
    t = torch.from_numpy(m)[None, None]
    for _ in range(5):
        t = F.max_pool2d(t, kernel_size=5, stride=1, padding=2)
    np.testing.assert_allclose(np.asarray(ours), t[0, 0].numpy())


@pytest.mark.parametrize("sq,sk", [(64, 64), (200, 77)])
def test_flash_attention_matches_xla(sq, sk):
    # NOTE: pallas interpret mode emulates TPU MXU numerics (bf16 matmul
    # inputs), so tolerance is bf16-level, not fp32-level.
    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, sq, 3, 32)).astype(np.float32)
    k = rng.standard_normal((2, sk, 3, 32)).astype(np.float32)
    v = rng.standard_normal((2, sk, 3, 32)).astype(np.float32)
    ours = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True,
        block_q=128, block_k=128,
    )
    ref = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-2)


def test_xla_attention_matches_torch_sdpa():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((2, 19, 4, 16)).astype(np.float32)
    k = rng.standard_normal((2, 23, 4, 16)).astype(np.float32)
    v = rng.standard_normal((2, 23, 4, 16)).astype(np.float32)
    ours = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"
    )
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_causal_attention_matches_torch():
    rng = np.random.default_rng(6)
    q = rng.standard_normal((1, 11, 2, 8)).astype(np.float32)
    ours = dot_product_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), causal=True, impl="xla"
    )
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(q).permute(0, 2, 1, 3),
        is_causal=True,
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_group_norm_silu_pallas_matches_xla():
    from ladi_vton_tpu.ops.group_norm import (
        group_norm_silu_pallas,
        group_norm_silu_xla,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 4, 128)).astype(np.float32)
    scale = rng.standard_normal(128).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)
    ours = group_norm_silu_pallas(jnp.asarray(x), jnp.asarray(scale),
                                  jnp.asarray(bias), num_groups=32,
                                  interpret=True, row_tile=8)
    ref = group_norm_silu_xla(jnp.asarray(x), jnp.asarray(scale),
                              jnp.asarray(bias), num_groups=32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_group_norm_silu_matches_flax_groupnorm_plus_silu():
    import torch

    from ladi_vton_tpu.ops.group_norm import group_norm_silu_xla

    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 3, 5, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    ours = group_norm_silu_xla(jnp.asarray(x), jnp.asarray(scale),
                               jnp.asarray(bias), num_groups=4, eps=1e-6)
    gn = torch.nn.functional.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2), 4,
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6)
    theirs = torch.nn.functional.silu(gn).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-5)


def test_nearest_up2_conv3x3_matches_naive():
    """The four-phase low-res decomposition is exactly the naive
    repeat-2x + 3x3 conv (same products, reassociated)."""
    from jax import lax

    from ladi_vton_tpu.ops.upsample import nearest_up2_conv3x3

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 5, 7, 8)).astype(np.float32)
    k = rng.standard_normal((3, 3, 8, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)

    up = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    dn = lax.conv_dimension_numbers(up.shape, k.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    naive = lax.conv_general_dilated(
        jnp.asarray(up), jnp.asarray(k), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=dn) + b

    fused = nearest_up2_conv3x3(jnp.asarray(x), jnp.asarray(k),
                                jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


def test_nearest_up2_conv3x3_grad_flows():
    from ladi_vton_tpu.ops.upsample import nearest_up2_conv3x3

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 3, 3, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))

    def loss(x, k):
        return jnp.sum(nearest_up2_conv3x3(x, k) ** 2)

    gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gk)).all()


def test_geglu_pallas_matches_xla():
    from ladi_vton_tpu.ops.geglu import _geglu, geglu_xla

    rng = np.random.default_rng(13)
    C, I = 64, 256
    x = jnp.asarray(rng.standard_normal((2, 40, C)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((C, 2 * I)) * 0.05)
                     .astype(np.float32))
    b1 = jnp.asarray((rng.standard_normal(2 * I) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((I, C)) * 0.05)
                     .astype(np.float32))
    b2 = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    # block 32 over 80 rows exercises the row-padding path
    ours = _geglu(x, w1, b1, w2, b2, 32, True)
    ref = geglu_xla(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_geglu_grad_matches_oracle():
    from ladi_vton_tpu.ops.geglu import _geglu, geglu_xla

    rng = np.random.default_rng(14)
    C, I = 32, 64
    args = [
        jnp.asarray(rng.standard_normal((1, 24, C)).astype(np.float32)),
        jnp.asarray((rng.standard_normal((C, 2 * I)) * 0.1)
                    .astype(np.float32)),
        jnp.asarray((rng.standard_normal(2 * I) * 0.1).astype(np.float32)),
        jnp.asarray((rng.standard_normal((I, C)) * 0.1).astype(np.float32)),
        jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    ]
    g_ours = jax.grad(lambda *a: jnp.sum(_geglu(*a, 32, True) ** 2),
                      argnums=tuple(range(5)))(*args)
    g_ref = jax.grad(lambda *a: jnp.sum(geglu_xla(*a) ** 2),
                     argnums=tuple(range(5)))(*args)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_layer_norm_pallas_matches_xla():
    from ladi_vton_tpu.ops.layer_norm import layer_norm_pallas, layer_norm_xla

    rng = np.random.default_rng(12)
    # 320 is deliberately NOT a multiple of 128 — the UNet level-0 width;
    # the kernel's cross-lane mean must mask the padded lanes
    x = rng.standard_normal((2, 24, 320)).astype(np.float32)
    scale = rng.standard_normal(320).astype(np.float32)
    bias = rng.standard_normal(320).astype(np.float32)
    ours = layer_norm_pallas(jnp.asarray(x), jnp.asarray(scale),
                             jnp.asarray(bias), interpret=True)
    ref = layer_norm_xla(jnp.asarray(x), jnp.asarray(scale),
                         jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_xla_matches_torch():
    import torch

    from ladi_vton_tpu.ops.layer_norm import layer_norm_xla

    rng = np.random.default_rng(13)
    x = rng.standard_normal((3, 7, 64)).astype(np.float32)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    ours = layer_norm_xla(jnp.asarray(x), jnp.asarray(scale),
                          jnp.asarray(bias), eps=1e-5)
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (64,), torch.from_numpy(scale),
        torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-5)


def test_layer_norm_pallas_grads_match_xla():
    from ladi_vton_tpu.ops.layer_norm import _ln_pallas_diff, layer_norm_xla

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    g_ours = jax.grad(
        lambda *a: jnp.sum(_ln_pallas_diff(*a, 1e-5, True) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(
        lambda *a: jnp.sum(layer_norm_xla(*a, eps=1e-5) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_layer_norm_module_matches_nn_layer_norm():
    """Same params (scale/bias), same numbers as flax nn.LayerNorm —
    checkpoint conversion must be unchanged by the fused module."""
    from flax import linen as nn

    from ladi_vton_tpu.models.layers import FusedLayerNorm

    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
    mod = FusedLayerNorm(epsilon=1e-5, impl="xla")
    variables = mod.init(jax.random.key(0), x)
    assert set(variables["params"]) == {"scale", "bias"}
    variables = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.standard_normal(p.shape).astype(np.float32)), variables)
    ref_mod = nn.LayerNorm(epsilon=1e-5)
    np.testing.assert_allclose(
        np.asarray(mod.apply(variables, x)),
        np.asarray(ref_mod.apply(variables, x)),
        rtol=1e-5, atol=1e-6)


def test_layer_norm_auto_dispatch_on_cpu_matches_xla():
    """impl='auto' must resolve to the XLA path off-TPU (the
    platform_dependent branch) for both wide and narrow (<128) rows."""
    from ladi_vton_tpu.ops.layer_norm import layer_norm, layer_norm_xla

    rng = np.random.default_rng(40)
    for C in (320, 64):  # wide (dispatchable) and narrow (forced XLA)
        x = jnp.asarray(rng.standard_normal((2, 8, C)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(layer_norm(x, scale, bias, impl="auto")),
            np.asarray(layer_norm_xla(x, scale, bias)),
            rtol=1e-5, atol=1e-6)
