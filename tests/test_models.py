"""Model-tower shape/semantics tests on tiny configs (1-core CPU budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladi_vton_tpu.models.emasc import EMASC, mask_features
from ladi_vton_tpu.models.inversion_adapter import InversionAdapter
from ladi_vton_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
)
from ladi_vton_tpu.models.refinement import UNetVanilla
from ladi_vton_tpu.models.tps import (
    ConvNetTPS,
    TPSGridGen,
    make_control_points,
)
from ladi_vton_tpu.models.unet_condition import UNet2DCondition, UNetConfig
from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=32)
TINY_UNET = UNetConfig(
    in_channels=31,
    block_out_channels=(32, 64, 64, 64),
    head_dim=8,
    cross_attention_dim=16,
)


def test_vae_encode_decode_shapes_and_taps():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 32, 24, 3))
    params = vae.init(jax.random.key(0), x)
    moments, feats = vae.apply(params, x, method="encode")
    # latent 8x downsample, 2*4 moment channels
    assert moments.shape == (1, 4, 3, 8)
    # taps: input, post-conv_in, pre-down x4 (reference vae.py:99-110);
    # spatial strides 1,1,1,2,4,8 (each tap is a down block's *input*)
    assert len(feats) == 6
    assert [f.shape[-1] for f in feats] == [3, 32, 32, 32, 32, 64]
    assert [f.shape[1] for f in feats] == [32, 32, 32, 16, 8, 4]
    dec = vae.apply(params, moments[..., :4], method="decode")
    assert dec.shape == (1, 32, 24, 3)


def test_vae_emasc_injection_arithmetic():
    """Decoder adds features pre-up-block + the int_layers 1-case feature."""
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 32, 24, 3))
    params = vae.init(jax.random.key(0), x)
    z = jnp.ones((1, 4, 3, 4))
    # EMASC-shaped injection features for int_layers [1..5]: reversed, one
    # per up-block input (channels/resolution of that input), then the
    # layer-1 feature after conv_norm_out (reference vae.py:183-212)
    feats = [
        jnp.ones((1, 32, 24, 32)),  # layer 1 -> after conv_norm_out
        jnp.ones((1, 32, 24, 32)),  # layer 2 -> before up block 3
        jnp.ones((1, 16, 12, 64)),  # layer 3 -> before up block 2
        jnp.ones((1, 8, 6, 64)),    # layer 4 -> before up block 1
        jnp.ones((1, 4, 3, 64)),    # layer 5 -> before up block 0
    ]
    out = vae.apply(params, z, feats, (1, 2, 3, 4, 5), method="decode")
    base = vae.apply(params, z, method="decode")
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_emasc_zero_init_linear_passthrough():
    emasc = EMASC(in_channels=(8, 16), out_channels=(8, 32), kind="linear")
    feats = [jnp.ones((1, 8, 8, 8)), jnp.ones((1, 4, 4, 16))]
    params = emasc.init(jax.random.key(0), feats)
    out = emasc.apply(params, feats)
    # linear EMASC is zero-initialized (reference emasc.py:42-45)
    assert all(np.allclose(np.asarray(o), 0.0) for o in out)
    assert out[0].shape == (1, 8, 8, 8)
    assert out[1].shape == (1, 4, 4, 32)


def test_emasc_nonlinear_shapes():
    emasc = EMASC(in_channels=(8, 16), out_channels=(8, 32), kind="nonlinear")
    feats = [jnp.ones((1, 8, 8, 8)), jnp.ones((1, 4, 4, 16))]
    params = emasc.init(jax.random.key(0), feats)
    out = emasc.apply(params, feats)
    assert out[0].shape == (1, 8, 8, 8)
    assert out[1].shape == (1, 4, 4, 32)


def test_mask_features_zeroes_inpaint_region():
    feats = [jnp.ones((1, 8, 8, 4))]
    mask = jnp.ones((1, 16, 16, 1))  # everything inpainted
    out = mask_features(feats, mask)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)


def test_unet_forward_shape():
    unet = UNet2DCondition(TINY_UNET, attn_impl="xla")
    x = jnp.zeros((1, 8, 8, 31))
    t = jnp.asarray([7])
    ctx = jnp.zeros((1, 5, 16))
    params = unet.init(jax.random.key(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)
    assert out.dtype == jnp.float32


def test_tps_grid_gen_identity():
    """Control points at targets -> identity sampling grid."""
    cp = make_control_points(5, 0.9)
    gen = TPSGridGen(8, 6, cp)
    grid = gen(jnp.asarray(cp)[None])
    ys = np.linspace(-1, 1, 8)
    xs = np.linspace(-1, 1, 6)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    expect = np.stack([gx, gy], axis=-1)[None]
    np.testing.assert_allclose(np.asarray(grid), expect, atol=1e-4)


def test_convnet_tps_end_to_end_identity_at_init():
    """Zero-weight + arctanh-bias regression -> identity warp at init."""
    tps = ConvNetTPS(height=32, width=24)
    cloth = jnp.zeros((2, 32, 24, 3))
    agn = jnp.zeros((2, 32, 24, 21))
    variables = tps.init(jax.random.key(0), cloth, agn)
    grid, coor, rx, ry, cx, cy, rg, cg = tps.apply(variables, cloth, agn)
    assert grid.shape == (2, 32, 24, 2)
    assert coor.shape == (2, 25, 2)
    cp = make_control_points(5, 0.9)
    np.testing.assert_allclose(np.asarray(coor[0]), cp, atol=1e-4)
    # identity warp grid
    ys = np.linspace(-1, 1, 32)
    xs = np.linspace(-1, 1, 24)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    np.testing.assert_allclose(
        np.asarray(grid[0]), np.stack([gx, gy], -1), atol=1e-3
    )
    for v in (rx, ry, cx, cy):
        assert np.asarray(v) >= 0.08 - 1e-6
    for v in (rg, cg):
        assert np.asarray(v) >= 0.02 - 1e-6


def test_refinement_unet_shape():
    net = UNetVanilla(out_channels=3, bilinear=True)
    x = jnp.zeros((1, 32, 24, 24))
    variables = net.init(jax.random.key(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 32, 24, 3)


def test_clip_text_tiny():
    cfg = CLIPTextConfig(vocab_size=300, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=16)
    model = CLIPTextModel(cfg)
    ids = jnp.asarray([[49, 3, 7, 260, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = model.init(jax.random.key(0), ids)
    h, pooled = model.apply(params, ids)
    assert h.shape == (1, 16, 32)
    assert pooled.shape == (1, 32)
    # pooled = position of max token id (260 at index 3)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(h[:, 3]))


def test_clip_vision_tiny():
    cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64,
                           image_size=28, patch_size=14)
    model = CLIPVisionModel(cfg)
    x = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5, 32)  # 4 patches + CLS


def test_inversion_adapter_tiny():
    from ladi_vton_tpu.models.clip import CLIPVisionConfig

    vc = CLIPVisionConfig(hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=4, intermediate_size=64)
    adapter = InversionAdapter(input_dim=32, hidden_dim=64,
                               output_dim=16 * 4, num_encoder_layers=1,
                               vision_config=vc)
    x = jnp.zeros((2, 5, 32))
    params = adapter.init(jax.random.key(0), x)
    out = adapter.apply(params, x)
    assert out.shape == (2, 64)


def test_vae_tiled_decode_matches_full_in_interior():
    vae = AutoencoderKL(TINY_VAE)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 8, 4)).astype(np.float32))
    params = vae.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    full = vae.apply(params, z, method="decode")
    tiled = vae.apply(params, z, tile=4, overlap=0.25,
                      method="tiled_decode")
    # tiled decode reconstructs the full canvas; per-tile conv halos make
    # it approximate (same tradeoff as the reference's tiled decode —
    # with random weights and tiny tiles the divergence is large, so
    # assert structure, not closeness)
    assert tiled.shape == full.shape
    assert np.isfinite(np.asarray(tiled)).all()
    # values stay in the decoder's output range (no seam artifacts
    # blowing up) and the result is not degenerate
    assert np.asarray(tiled).std() > 0.01


def test_vto_grad_accumulation_equivalence():
    """A=2 accumulation == averaged unaccumulated microbatch updates.

    The accumulated step splits the batch into A microbatches, draws
    ``jax.random.split(rng, A)[i]`` for microbatch i, averages grads,
    and applies ONE update.  With a linear optimizer (plain SGD, no
    clipping) that update equals the mean of the per-microbatch SGD
    updates from the same initial state and the same per-microbatch
    rngs — an exact equivalence, checked parameter-by-parameter.
    (Reference semantics: accelerate.accumulate, src/train_vto.py:519.)
    """
    import jax as _jax
    import optax

    from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
    from ladi_vton_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from ladi_vton_tpu.models.unet_condition import UNet2DCondition, UNetConfig
    from ladi_vton_tpu.train.steps import (
        TrainState,
        VTOStepConfig,
        make_vto_train_step,
    )

    H = W = 64
    unet = UNet2DCondition(
        UNetConfig(in_channels=31, block_out_channels=(32, 64, 64, 64),
                   head_dim=8, cross_attention_dim=64), attn_impl="xla")
    vae = AutoencoderKL(TINY_VAE)
    text_model = CLIPTextModel(CLIPTextConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16))
    rng = _jax.random.key(0)
    gen = np.random.default_rng(7)

    def micro(i):
        return {
            "image": jnp.asarray(gen.standard_normal(
                (1, H, W, 3)).astype(np.float32)) * 0.1,
            "im_mask": jnp.zeros((1, H, W, 3)),
            "inpaint_mask": jnp.ones((1, H, W, 1)),
            "pose_map": jnp.zeros((1, H, W, 18)),
            "warped_cloth": jnp.zeros((1, H, W, 3)),
            "input_ids": jnp.zeros((1, 16), jnp.int32),
        }

    micro1, micro2 = micro(0), micro(1)
    full = {k: jnp.concatenate([micro1[k], micro2[k]]) for k in micro1}
    unet_params = unet.init(rng, jnp.zeros((1, H // 8, W // 8, 31)),
                            jnp.asarray([0]), jnp.zeros((1, 16, 64)))
    frozen = {
        "vae": vae.init(rng, micro1["image"]),
        "text": text_model.init(rng, micro1["input_ids"]),
    }

    def make(accum):
        cfg = VTOStepConfig(text_usage="none", uncond_fraction=0.0,
                            gradient_accumulation_steps=accum)
        return make_vto_train_step(
            unet=unet, vae=vae, text_model=text_model,
            noise_scheduler=DDPMScheduler(), config=cfg)

    lr = 1e-2
    tx = optax.sgd(lr)
    s0 = TrainState.create({"unet": unet_params}, tx)

    s_accum, m_accum = _jax.jit(make(2))(s0, frozen, full, rng)

    step1 = _jax.jit(make(1))
    rngs = _jax.random.split(rng, 2)
    s_a, m_a = step1(s0, frozen, micro1, rngs[0])
    s_b, m_b = step1(s0, frozen, micro2, rngs[1])

    # loss is the microbatch mean
    np.testing.assert_allclose(
        float(m_accum["loss"]),
        (float(m_a["loss"]) + float(m_b["loss"])) / 2, rtol=1e-5)
    # p0 - lr*mean(g) == mean(p0 - lr*g_i): compare every parameter
    expected = _jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, s_a.params, s_b.params)
    flat_e, _ = _jax.tree_util.tree_flatten(expected)
    flat_g, _ = _jax.tree_util.tree_flatten(s_accum.params)
    assert len(flat_e) == len(flat_g)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   atol=1e-5, rtol=1e-4)


def test_cross_attention_bhsd_layout_matches_plain():
    """attn_impl='bhsd' (head-major einsum projections, no relayout
    transposes around the flash kernel — docs/PERF.md §6) is numerically
    identical to the plain BSHD path; param trees are interchangeable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladi_vton_tpu.models.layers import CrossAttention

    rng = np.random.default_rng(0)
    # S > 128 so the bhsd branch engages (short-KV keeps the XLA path)
    x = jnp.asarray(rng.standard_normal((2, 160, 24)).astype(np.float32))
    plain = CrossAttention(num_heads=3, head_dim=8, out_dim=24,
                           attn_impl="xla")
    bhsd = CrossAttention(num_heads=3, head_dim=8, out_dim=24,
                          attn_impl="bhsd")
    variables = plain.init(jax.random.key(0), x)
    # identical param tree: bhsd applies the same checkpoint
    a = plain.apply(variables, x)
    b = bhsd.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)

    # cross-attention (short context) falls back to the plain path
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)).astype(np.float32))
    a = plain.apply(variables, x, ctx)
    b = bhsd.apply(variables, x, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_context_kv_hoisting_matches_inline():
    """precompute_context_kv + context_kv= must reproduce the inline
    path exactly (same dots on the same values) and cover every
    cross-attention in call order."""
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
        precompute_context_kv,
    )

    cfg = UNetConfig(in_channels=9, block_out_channels=(32, 64, 64, 64),
                     head_dim=8, cross_attention_dim=48)
    unet = UNet2DCondition(cfg, attn_impl="xla")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 9)).astype(np.float32))
    t = jnp.asarray([3, 7])
    ctx = jnp.asarray(rng.standard_normal((2, 7, 48)).astype(np.float32))
    variables = unet.init(jax.random.key(0), x, t, ctx)

    base = unet.apply(variables, x, t, ctx)
    kvs = precompute_context_kv(variables, ctx, cfg, jnp.float32)
    # 3 attn down blocks x 2 layers + mid + 3 attn up blocks x 3 layers
    assert len(kvs) == 16
    hoisted = unet.apply(variables, x, t, ctx, context_kv=kvs)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                               rtol=1e-6, atol=1e-6)

    # too many entries -> loud order-mismatch error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        unet.apply(variables, x, t, ctx, context_kv=kvs + [kvs[0]])


def test_unet_sd15_conv_projection_variant():
    """SD-1.5-style UNet (conv proj_in/out, fixed 8 heads) forward +
    context-KV hoisting parity on that variant (reference loads either
    family; hubconf.py picks per dataset)."""
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
        precompute_context_kv,
    )

    cfg = UNetConfig(in_channels=9, block_out_channels=(32, 32, 64, 64),
                     head_dim=-1, cross_attention_dim=48,
                     use_linear_projection=False)
    unet = UNet2DCondition(cfg, attn_impl="xla")
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 9)).astype(np.float32))
    t = jnp.asarray([1, 5])
    ctx = jnp.asarray(rng.standard_normal((2, 7, 48)).astype(np.float32))
    variables = unet.init(jax.random.key(1), x, t, ctx)
    base = unet.apply(variables, x, t, ctx)
    assert base.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(base)).all()

    kvs = precompute_context_kv(variables, ctx, cfg, jnp.float32)
    assert len(kvs) == 16
    hoisted = unet.apply(variables, x, t, ctx, context_kv=kvs)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_lr_schedule_union_matches_diffusers_semantics():
    """make_lr_schedule mirrors diffusers get_scheduler
    (reference src/train_emasc.py:303-308): warmup ramp, then the
    name-specific decay; endpoint values checked per name."""
    from ladi_vton_tpu.train.steps import make_lr_schedule

    lr, warm, total = 1e-3, 100, 1100

    def val(s, step):
        return float(s(step)) if callable(s) else float(s)

    s = make_lr_schedule("constant", lr)
    assert val(s, 0) == lr

    s = make_lr_schedule("constant_with_warmup", lr, warm)
    assert val(s, 0) == 0.0
    np.testing.assert_allclose(val(s, 50), lr / 2, rtol=1e-6)
    np.testing.assert_allclose(val(s, warm), lr, rtol=1e-6)
    np.testing.assert_allclose(val(s, 10 * total), lr, rtol=1e-6)

    s = make_lr_schedule("linear", lr, warm, total)
    np.testing.assert_allclose(val(s, warm), lr, rtol=1e-6)
    np.testing.assert_allclose(val(s, (warm + total) // 2), lr / 2,
                               rtol=1e-2)
    np.testing.assert_allclose(val(s, total), 0.0, atol=1e-9)

    s = make_lr_schedule("cosine", lr, warm, total)
    np.testing.assert_allclose(val(s, warm), lr, rtol=1e-6)
    np.testing.assert_allclose(val(s, total), 0.0, atol=1e-9)
    mid = val(s, (warm + total) // 2)
    assert 0.0 < mid < lr  # strictly inside the half-cosine

    s = make_lr_schedule("polynomial", lr, warm, total)
    np.testing.assert_allclose(val(s, warm), lr, rtol=1e-6)
    np.testing.assert_allclose(val(s, total), 1e-7, rtol=1e-3)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_lr_schedule("linear", lr, warm, None)
    with _pytest.raises(ValueError):
        make_lr_schedule("nope", lr, warm, total)


def test_emasc_grad_accumulation_equivalence():
    """Same equivalence as the VTO test, through the shared
    build_train_step path with aux metrics: A=2 emasc step == averaged
    microbatch SGD updates; metrics average over microbatches."""
    import optax

    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.models.vgg import VGG19Features
    from ladi_vton_tpu.train.steps import TrainState, make_emasc_train_step

    rng = jax.random.key(0)
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64)))
    emasc = EMASC(in_channels=(32, 32, 32, 32, 64),
                  out_channels=(32, 32, 64, 64, 64))
    vgg = VGG19Features()
    H = W = 32
    vae_vars = vae.init(rng, jnp.zeros((1, H, W, 3)))
    _, feats = vae.apply(vae_vars, jnp.zeros((1, H, W, 3)),
                         method="encode")
    emasc_vars = emasc.init(rng, [jnp.zeros_like(feats[i])
                                  for i in (1, 2, 3, 4, 5)])
    g = np.random.default_rng(1)
    vgg_vars = jax.tree_util.tree_map(
        lambda x: x, VGG19Features().init(
            jax.random.key(2), jnp.zeros((1, 32, 32, 3))))

    batch = {
        "image": jnp.asarray(g.uniform(-1, 1, (4, H, W, 3)),
                             jnp.float32),
        "im_mask": jnp.asarray(g.uniform(-1, 1, (4, H, W, 3)),
                               jnp.float32),
        "inpaint_mask": jnp.asarray(
            (g.uniform(size=(4, H, W, 1)) > 0.5), jnp.float32),
    }
    frozen = {"vae": vae_vars, "vgg": vgg_vars}
    tx = optax.sgd(1e-3)
    rng_step = jax.random.key(7)

    accum = make_emasc_train_step(vae=vae, emasc=emasc, vgg=vgg,
                                  gradient_accumulation_steps=2)
    state0 = TrainState.create({"emasc": emasc_vars}, tx)
    state_a, metrics_a = accum(state0, frozen, batch, rng_step)

    plain = make_emasc_train_step(vae=vae, emasc=emasc, vgg=vgg)
    rngs = jax.random.split(rng_step, 2)
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape(2, 2, *x.shape[1:]), batch)
    updates = []
    for i in range(2):
        mb = jax.tree_util.tree_map(lambda x: x[i], micro)
        st, _ = plain(state0, frozen, mb, rngs[i])
        updates.append(jax.tree_util.tree_map(
            lambda new, old: new - old, st.params, state0.params))
    mean_update = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, *updates)
    expect = jax.tree_util.tree_map(jnp.add, state0.params, mean_update)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert set(metrics_a) == {"loss", "l1", "vgg"}
