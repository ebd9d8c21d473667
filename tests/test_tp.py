"""Tensor-parallel (model-axis) sharding tests on the virtual CPU mesh.

The reference has no TP (its only strategy is DDP — SURVEY.md §2.5);
``parallel/tp.py`` is a beyond-parity scaling layout.  These tests pin:

* the Megatron column/row spec plan covers every attention + FF matmul,
* a TP-sharded UNet forward is numerically the replicated forward,
* a 2D (data x model) vto train step matches the single-device step,
* the TP sampler produces the single-device pipeline's pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh
from ladi_vton_tpu.models.unet_condition import UNet2DCondition, UNetConfig
from ladi_vton_tpu.parallel.tp import (
    tensor_parallel_sampler,
    tp_jit_step,
    tp_place,
    tp_shardings,
    tp_train_state,
    unet_tp_specs,
)

TINY_UNET = UNetConfig(in_channels=31, block_out_channels=(32, 64, 64, 64),
                       head_dim=8, cross_attention_dim=64)
H, W = 64, 64


def _need_mesh(data, model):
    if len(jax.devices()) < data * model:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(MeshSpec(data=data, model=model),
                     devices=jax.devices()[: data * model])


def _tiny_unet_and_params(rng):
    unet = UNet2DCondition(TINY_UNET, attn_impl="xla")
    params = unet.init(rng, jnp.zeros((1, H // 8, W // 8, 31)),
                       jnp.asarray([0]), jnp.zeros((1, 7, 64)))
    return unet, params


def test_tp_specs_cover_attention_and_ff():
    rng = jax.random.key(0)
    _, params = _tiny_unet_and_params(rng)
    specs = unet_tp_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]

    def paths_with(spec):
        return {
            "/".join(p.key for p in path
                     if isinstance(p, jax.tree_util.DictKey))
            for path, s in flat if s == spec
        }

    col = paths_with(P(None, "model"))
    row = paths_with(P("model", None))
    # every qkv + geglu kernel is column-parallel, every out-proj row-
    assert any("attn1/to_q/kernel" in p for p in col)
    assert any("attn2/to_k/kernel" in p for p in col)
    assert any("ff/proj_geglu/kernel" in p for p in col)
    assert any("attn1/to_out/kernel" in p for p in row)
    assert any("ff/proj_out/kernel" in p for p in row)
    # transformer-level proj_in/out and convs stay replicated
    assert not any("proj_in" in p for p in col | row)
    assert not any("conv" in p for p in col | row)
    # no kernel under attn/ff escaped the plan
    missed = [
        "/".join(p.key for p in path
                 if isinstance(p, jax.tree_util.DictKey))
        for path, s in flat
        if s == P()
        for joined in ["/".join(p.key for p in path
                                if isinstance(p, jax.tree_util.DictKey))]
        if joined.endswith("kernel")
        and ("/attn" in joined or "/ff/" in joined)
    ]
    assert not missed, missed


def test_tp_forward_matches_replicated():
    mesh = _need_mesh(data=2, model=4)
    rng = jax.random.key(1)
    unet, params = _tiny_unet_and_params(rng)

    x = jax.random.normal(jax.random.key(2), (4, H // 8, W // 8, 31))
    t = jnp.asarray([7, 7, 7, 7])
    ctx = jax.random.normal(jax.random.key(3), (4, 7, 64))

    ref = unet.apply(params, x, t, ctx)

    placed = tp_place(params, mesh)
    # a qkv kernel is genuinely split over the model axis
    leaf = placed["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    shard_cols = {s.data.shape[-1] for s in leaf.addressable_shards}
    assert shard_cols == {leaf.shape[-1] // 4}

    data = jax.sharding.NamedSharding(mesh, P("data"))
    out = jax.jit(unet.apply)(placed, jax.device_put(x, data),
                              jax.device_put(t, data),
                              jax.device_put(ctx, data))
    # sharded matmuls re-associate the reductions — tolerance, not
    # bit-equality, is the correct contract here
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_eval_placement_tp_shards_unet():
    """eval_placement on a model>1 mesh gives the "unet" sub-tree the
    Megatron plan and replicates everything else — this placement is
    the whole TP mechanism behind the CLIs' --tensor_parallel flag."""
    from ladi_vton_tpu.parallel.sharding import eval_placement

    mesh = _need_mesh(data=2, model=4)
    _, params = _tiny_unet_and_params(jax.random.key(0))
    put_repl, put_data = eval_placement(mesh)

    placed = put_repl({"unet": params, "vae": {"w": jnp.zeros((8, 8))}})
    qk = placed["unet"]["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    assert placed["vae"]["w"].sharding.spec == P()
    # trees without a "unet" key (conditioning towers) replicate whole
    cond = put_repl({"tps": {"w": jnp.zeros((4,))}})
    assert cond["tps"]["w"].sharding.spec == P()
    # batches still shard over data
    x = put_data({"image": jnp.zeros((4, 8, 8, 3))})["image"]
    assert x.sharding.spec == P("data")


def test_tp_shard_map_attention_matches_global():
    """With TP_SHARD_MESH set, the attention dispatch runs per-shard
    under shard_map (head axis over ``model``) and is numerically the
    un-sharded dispatch; head counts that don't divide the model axis
    fall back to the global path instead of erroring."""
    from ladi_vton_tpu.ops.attention import dot_product_attention
    from ladi_vton_tpu.parallel.tp import tp_attention_mesh

    mesh = _need_mesh(data=2, model=4)
    B, S, H_, D = 4, 64, 8, 16
    ks = [jax.random.normal(jax.random.key(i), (B, S, H_, D))
          for i in range(3)]
    ref = dot_product_attention(*ks)
    with tp_attention_mesh(mesh):
        out = jax.jit(dot_product_attention)(*ks)
        # head-major layout shards axis 1 instead
        bhsd = [jnp.transpose(a, (0, 2, 1, 3)) for a in ks]
        out_h = jax.jit(
            lambda q, k, v: dot_product_attention(q, k, v, bhsd=True)
        )(*bhsd)
        # 5 heads don't divide model=4 -> global GSPMD path, same math
        k5 = [a[:, :, :5] for a in ks]
        out5 = jax.jit(dot_product_attention)(*k5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out_h, (0, 2, 1, 3))), np.asarray(ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out5),
                               np.asarray(dot_product_attention(*k5)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_tp_unet_forward_with_shard_map_attention():
    """Whole tiny UNet, attn_impl='auto', TP-placed params, shard_map
    attention routing active — matches the replicated forward.  This is
    the exact configuration the CLIs' --tensor_parallel wiring sets up
    (eval_placement TP plan + ops.attention.TP_SHARD_MESH)."""
    from ladi_vton_tpu.parallel.tp import tp_attention_mesh

    mesh = _need_mesh(data=2, model=4)
    unet = UNet2DCondition(TINY_UNET)  # default attn_impl (auto-routed)
    rng = jax.random.key(1)
    params = unet.init(rng, jnp.zeros((1, H // 8, W // 8, 31)),
                       jnp.asarray([0]), jnp.zeros((1, 7, 64)))

    x = jax.random.normal(jax.random.key(2), (4, H // 8, W // 8, 31))
    t = jnp.asarray([7, 7, 7, 7])
    ctx = jax.random.normal(jax.random.key(3), (4, 7, 64))
    ref = unet.apply(params, x, t, ctx)

    placed = tp_place(params, mesh)
    data = jax.sharding.NamedSharding(mesh, P("data"))
    with tp_attention_mesh(mesh):
        out = jax.jit(unet.apply)(placed, jax.device_put(x, data),
                                  jax.device_put(t, data),
                                  jax.device_put(ctx, data))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_tp_shardings_reject_indivisible_axis():
    # inner width 32 not divisible by tp=3 -> clear error, not an
    # opaque device_put failure downstream
    mesh = _need_mesh(data=2, model=3)
    rng = jax.random.key(0)
    _, params = _tiny_unet_and_params(rng)
    with pytest.raises(ValueError, match="does not divide"):
        tp_shardings(params, mesh)


@pytest.mark.slow
def test_vto_train_step_2d_matches_single_device(tmp_path):
    """One DP(2) x TP(4) vto train step == the plain single-device step:
    same loss, same updated params, with the UNet matmul params (and
    their Adam moments) actually sharded over the model axis.

    The numeric comparison runs under SGD: sharded matmuls re-associate
    reductions (~1e-7 grad noise), and a single Adam step amplifies any
    near-zero-gradient noise to a +-lr sign flip (update ~ sign(g)*lr),
    so Adam single-step equality is not a meaningful contract.  Adam
    appears separately for the moment-sharding assertions."""
    import optax

    from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
    from ladi_vton_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.train.steps import (
        TrainState,
        VTOStepConfig,
        make_optimizer,
        make_vto_train_step,
    )

    mesh = _need_mesh(data=2, model=4)
    unet, unet_params = _tiny_unet_and_params(jax.random.key(0))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64)))
    text_cfg = CLIPTextConfig(vocab_size=300, hidden_size=64,
                              num_hidden_layers=1, num_attention_heads=4,
                              intermediate_size=64,
                              max_position_embeddings=16)
    text_model = CLIPTextModel(text_cfg)

    rng = jax.random.key(5)
    B = 4
    batch = {
        "image": jax.random.normal(jax.random.key(6), (B, H, W, 3)) * 0.1,
        "im_mask": jnp.zeros((B, H, W, 3)),
        "inpaint_mask": jnp.ones((B, H, W, 1)),
        "pose_map": jnp.zeros((B, H, W, 18)),
        "warped_cloth": jnp.zeros((B, H, W, 3)),
        "input_ids": jnp.zeros((B, 16), jnp.int32),
    }
    vae_params = vae.init(rng, batch["image"][:1])
    text_params = text_model.init(rng, batch["input_ids"][:1])
    frozen = {"vae": vae_params, "text": text_params}

    step = make_vto_train_step(
        unet=unet, vae=vae, text_model=text_model,
        noise_scheduler=DDPMScheduler(),
        config=VTOStepConfig(text_usage="none", uncond_fraction=0.0),
        empty_prompt_ids=jnp.zeros((16,), jnp.int32))

    def fresh_state(tx):
        params = jax.tree_util.tree_map(jnp.array, {"unet": unet_params})
        return TrainState.create(params, tx)

    # Adam moment shardings (no step needed — tp_train_state assigns
    # them through out_shardings on tx.init)
    adam_state = tp_train_state(fresh_state(make_optimizer(1e-3)), mesh)
    mu_sharded = [
        l for l in jax.tree_util.tree_leaves(adam_state.opt_state)
        if "model" in str(getattr(l.sharding, "spec", ""))
    ]
    assert mu_sharded, "no Adam moment ended up model-sharded"

    # single device reference (SGD)
    s_ref, m_ref = jax.jit(step)(fresh_state(optax.sgd(1e-3)), frozen,
                                 batch, rng)

    # 2D mesh
    state = tp_train_state(fresh_state(optax.sgd(1e-3)), mesh)
    qk = state.params["unet"]["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert {s.data.shape[-1] for s in qk.addressable_shards} \
        == {qk.shape[-1] // 4}

    jitted, shard_batch = tp_jit_step(step, mesh)
    repl = jax.sharding.NamedSharding(mesh, P())
    s_tp, m_tp = jitted(state, jax.device_put(frozen, repl),
                        shard_batch(batch), rng)

    assert np.isclose(float(m_ref["loss"]), float(m_tp["loss"]), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_ref.params)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6, err_msg=str(pa))
    # updated params KEPT their TP shardings (no silent replication)
    qk2 = s_tp.params["unet"]["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(qk2.sharding.spec)

    # TP checkpoint round trip (the dryrun phase-2 cycle on the 2D
    # mesh): sharded save -> restore INTO the live memory -> the
    # model-axis shardings survive and the restored state steps
    from ladi_vton_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", keep=2)
    mgr.save(1, s_tp)
    restored = mgr.restore_replacing(s_tp, "latest")
    qk3 = restored.params["unet"]["params"]["down_blocks_0"][
        "attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(qk3.sharding.spec)
    s3, m3 = jitted(restored, jax.device_put(frozen, repl),
                    shard_batch(batch), rng)
    assert np.isfinite(float(m3["loss"]))


def _vto_step_fixture():
    """Shared tiny towers + batch for the 2D train-step tests."""
    from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
    from ladi_vton_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.train.steps import VTOStepConfig, make_vto_train_step

    unet, unet_params = _tiny_unet_and_params(jax.random.key(0))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64)))
    text_cfg = CLIPTextConfig(vocab_size=300, hidden_size=64,
                              num_hidden_layers=1, num_attention_heads=4,
                              intermediate_size=64,
                              max_position_embeddings=16)
    text_model = CLIPTextModel(text_cfg)
    B = 8
    batch = {
        "image": jax.random.normal(jax.random.key(6), (B, H, W, 3)) * 0.1,
        "im_mask": jnp.zeros((B, H, W, 3)),
        "inpaint_mask": jnp.ones((B, H, W, 1)),
        "pose_map": jnp.zeros((B, H, W, 18)),
        "warped_cloth": jnp.zeros((B, H, W, 3)),
        "input_ids": jnp.zeros((B, 16), jnp.int32),
    }
    rng = jax.random.key(5)
    frozen = {"vae": vae.init(rng, batch["image"][:1]),
              "text": text_model.init(rng, batch["input_ids"][:1])}

    def make_step(accum=1):
        return make_vto_train_step(
            unet=unet, vae=vae, text_model=text_model,
            noise_scheduler=DDPMScheduler(),
            config=VTOStepConfig(text_usage="none", uncond_fraction=0.0,
                                 gradient_accumulation_steps=accum),
            empty_prompt_ids=jnp.zeros((16,), jnp.int32))

    return unet_params, frozen, batch, make_step


@pytest.mark.slow
def test_vto_adam_trajectory_2d_matches_single_device():
    """10-step ADAM trajectory, 2D DP(2)xTP(4) vs single device
    (VERDICT r4 item 6a — replaces the r4 docstring's untested
    'sign-amplified noise' dismissal with a measurement).

    Tolerance derivation (fp32 on CPU): sharded matmuls re-associate
    reductions, giving relative gradient noise ~1e-6; Adam normalizes
    by sqrt(nu), so a param whose TRUE gradient is near zero can take a
    ~±lr sign-flipped update — per-step worst-case divergence 2*lr per
    such param, i.e. ±2e-2 over 10 steps at lr=1e-3.  The aggregate
    LOSS is insensitive to those dead-param wiggles, so the contract
    is: per-step losses match to 1%, final params within atol=20*lr."""
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer

    mesh = _need_mesh(data=2, model=4)
    unet_params, frozen, batch, make_step = _vto_step_fixture()
    step = make_step()
    lr = 1e-3

    def run(tp):
        params = jax.tree_util.tree_map(jnp.array, {"unet": unet_params})
        state = TrainState.create(params, make_optimizer(lr))
        losses = []
        if tp:
            state = tp_train_state(state, mesh)
            jitted, shard_batch = tp_jit_step(step, mesh)
            fr = jax.device_put(frozen,
                                jax.sharding.NamedSharding(mesh, P()))
        else:
            jitted, shard_batch = jax.jit(step), lambda b: b
            fr = frozen
        for i in range(10):
            state, m = jitted(state, fr, shard_batch(batch),
                              jax.random.fold_in(jax.random.key(9), i))
            losses.append(float(m["loss"]))
        return state, losses

    s_ref, losses_ref = run(tp=False)
    s_tp, losses_tp = run(tp=True)
    np.testing.assert_allclose(losses_tp, losses_ref, rtol=1e-2,
                               err_msg="Adam loss curves diverged")
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_ref.params)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=20 * lr,
                                   err_msg=str(pa))
    # the Adam moments stayed model-sharded across all 10 steps
    mu_sharded = [
        l for l in jax.tree_util.tree_leaves(s_tp.opt_state)
        if "model" in str(getattr(l.sharding, "spec", ""))
    ]
    assert mu_sharded, "Adam moments lost their model sharding"


@pytest.mark.slow
def test_tp_grad_accumulation_equivalence():
    """TP x gradient accumulation (VERDICT r4 item 6b): the A=2
    accumulated step ON THE 2D MESH equals the average of the two
    per-microbatch single-device SGD updates with the same
    per-microbatch rngs (the exact contract of the single-device test,
    tests/test_models.py:212) — exact math, TP re-association
    tolerance."""
    import optax

    from ladi_vton_tpu.train.steps import TrainState

    mesh = _need_mesh(data=2, model=4)
    unet_params, frozen, batch, make_step = _vto_step_fixture()
    rng = jax.random.key(11)

    def fresh():
        params = jax.tree_util.tree_map(jnp.array, {"unet": unet_params})
        return TrainState.create(params, optax.sgd(1e-3))

    # 2D TP accumulated step (microbatch i gets split(rng, 2)[i])
    state = tp_train_state(fresh(), mesh)
    jitted, shard_batch = tp_jit_step(make_step(2), mesh)
    fr = jax.device_put(frozen, jax.sharding.NamedSharding(mesh, P()))
    s_tp, m_tp = jitted(state, fr, shard_batch(batch), rng)

    # single-device reference: average of per-microbatch SGD updates
    B = batch["image"].shape[0]
    step1 = jax.jit(make_step(1))
    rngs = jax.random.split(rng, 2)
    halves = []
    for i in range(2):
        mb = jax.tree_util.tree_map(
            lambda x: x[i * B // 2:(i + 1) * B // 2], batch)
        s_i, _ = step1(fresh(), frozen, mb, rngs[i])
        halves.append(s_i.params)
    avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *halves)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(avg)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6, err_msg=str(pa))
    qk = s_tp.params["unet"]["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(qk.sharding.spec)  # shardings survive accum


@pytest.mark.slow
def test_tp_unet_forward_gspmd_fallback_parity():
    """UNet forward where the level-0 head count (4) does NOT divide the
    model axis (8) — the SD-2 level-0 5-head situation (VERDICT r4 item
    6c).  The attention dispatch falls back to global GSPMD at level 0
    while deeper levels (8 heads) take the shard_map fast path; the
    mixed-routing forward must match the replicated forward."""
    from ladi_vton_tpu.parallel.tp import tp_attention_mesh

    mesh = _need_mesh(data=1, model=8)
    unet = UNet2DCondition(TINY_UNET)  # heads per level: 4, 8, 8, 8
    params = unet.init(jax.random.key(1), jnp.zeros((1, H // 8, W // 8, 31)),
                       jnp.asarray([0]), jnp.zeros((1, 7, 64)))

    x = jax.random.normal(jax.random.key(2), (4, H // 8, W // 8, 31))
    t = jnp.asarray([7, 7, 7, 7])
    ctx = jax.random.normal(jax.random.key(3), (4, 7, 64))
    ref = unet.apply(params, x, t, ctx)

    placed = tp_place(params, mesh)
    with tp_attention_mesh(mesh):
        out = jax.jit(unet.apply)(placed, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_tensor_parallel_sampler_matches_single_device():
    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    mesh = _need_mesh(data=2, model=4)
    unet, unet_params = _tiny_unet_and_params(jax.random.key(0))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64)))
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, H, W, 3)))
    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=None,
                         scheduler=DDIMScheduler())
    params = {"unet": unet_params, "vae": vae_params}

    B = 4
    args = (
        jax.random.normal(jax.random.key(2), (B, H, W, 3)) * 0.1,
        jnp.ones((B, H, W, 1)),
        jnp.zeros((B, H, W, 18)),
        jnp.zeros((B, H, W, 3)),
        jnp.zeros((B, 7, 64)),
        jnp.zeros((B, 7, 64)),
        jax.random.key(7),
    )

    def sample_fn(p, image, mask_image, pose_map, warped_cloth,
                  prompt_embeds, negative_prompt_embeds, rng):
        return pipe.sample(
            p, image=image, mask_image=mask_image, pose_map=pose_map,
            warped_cloth=warped_cloth, prompt_embeds=prompt_embeds,
            negative_prompt_embeds=negative_prompt_embeds, rng=rng,
            num_inference_steps=2, guidance_scale=7.5)

    ref = sample_fn(params, *args)
    jitted, placed = tensor_parallel_sampler(sample_fn, mesh, params)
    out = jitted(placed, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
