"""Jitted, mesh-sharded training steps for the four training stages.

The reference trains with HF accelerate (DDP + AMP + grad accumulation,
reference: src/train_vto.py:434-442,519-652).  Here each stage is a pure
``(state, batch, rng) -> (state, metrics)`` function jitted over a
``Mesh``: batches are sharded on the ``data`` axis, parameters are
replicated, and XLA inserts the gradient all-reduce when the mean loss
is differentiated — the TPU-native equivalent of DDP+NCCL.

Stage semantics mirrored from the reference:
* train_vto (src/train_vto.py:519-652): frozen-VAE latent sampling,
  U[0,1000) timesteps, DDPM noising, pose 8x down, mask nearest-resized
  to 64x48, independent Bernoulli(uncond_fraction) dropout of text /
  pose / cloth (:596-604 — text dropout swaps in the empty-prompt token
  ids, matching the string-level swap), 31-channel concat, MSE on noise,
  grad-clip 1.0.
* train_emasc (src/train_emasc.py:386-418): encode person image
  (latents) + masked person (features), adapt + mask features, decode
  with injection, L1 + 0.5*VGG, grad clip 1.0.
* train_tps phase A / phase B (src/train_tps.py:95-220): warp-grid L1 +
  smoothness-constant loss; refinement L1 + 0.25*VGG.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ladi_vton_tpu.diffusion.schedulers import DDPMScheduler
from ladi_vton_tpu.diffusion.text import splice_word_embeddings
from ladi_vton_tpu.models.emasc import mask_features
from ladi_vton_tpu.ops.resize import resize_bilinear, resize_nearest


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + optax optimizer state)."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_lr_schedule(name: str, lr: float, warmup_steps: int = 0,
                     total_steps: Optional[int] = None,
                     lr_end: float = 1e-7, power: float = 1.0):
    """The reference's diffusers ``get_scheduler`` union
    (src/train_emasc.py:303-308, train_vto.py:443-448): linear | cosine
    | cosine_with_restarts | polynomial | constant |
    constant_with_warmup.  Our optimizer steps once per UPDATE (the
    reference steps its scheduler per micro-step and scales
    warmup/total by gradient_accumulation_steps — same lr-vs-update
    trajectory), so pass UPDATE counts here."""
    if name == "constant":
        return lr
    if name == "constant_with_warmup":
        if warmup_steps <= 0:
            return lr
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)], [warmup_steps])
    if total_steps is None:
        raise ValueError(f"lr scheduler {name!r} needs total_steps")
    decay = max(total_steps - warmup_steps, 1)
    if name == "linear":
        tail = optax.linear_schedule(lr, 0.0, decay)
    elif name in ("cosine", "cosine_with_restarts"):
        # diffusers defaults: cosine num_cycles=0.5 (one half-wave to
        # 0); cosine_with_restarts num_cycles=1 is the same curve
        tail = optax.cosine_decay_schedule(lr, decay, alpha=0.0)
    elif name == "polynomial":
        # diffusers polynomial: (lr - lr_end)*(1-progress)^power+lr_end
        tail = lambda step: ((lr - lr_end)
                             * (1 - jnp.minimum(step, decay) / decay)
                             ** power + lr_end)
    else:
        raise ValueError(f"unknown lr scheduler {name!r}")
    if warmup_steps <= 0:
        return tail
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), tail],
        [warmup_steps])


def make_optimizer(lr: float = 1e-5, *, adam_beta1=0.9, adam_beta2=0.999,
                   adam_eps=1e-8, weight_decay=1e-2, max_grad_norm=1.0,
                   warmup_steps: int = 0,
                   lr_scheduler: str = "constant_with_warmup",
                   total_steps: Optional[int] = None):
    """AdamW + global-norm clip, mirroring the reference flags
    (src/train_vto.py:99-136: lr 1e-5, wd 1e-2, clip 1.0) with the
    diffusers lr-scheduler union."""
    schedule = make_lr_schedule(lr_scheduler, lr, warmup_steps,
                                total_steps)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=adam_beta1, b2=adam_beta2, eps=adam_eps,
                    weight_decay=weight_decay),
    )


def build_train_step(loss_fn_aux: Callable,
                     gradient_accumulation_steps: int = 1) -> Callable:
    """Turn ``loss_fn_aux(params, frozen, batch, rng) -> (loss,
    metrics_dict)`` into a TrainState step, with optional in-step
    microbatch gradient accumulation (reference: accelerate.accumulate,
    src/train_vto.py:519): the global batch reshapes to (A, b, ...) and
    a ``lax.scan`` accumulates grads before ONE optimizer update —
    numerically the averaged-microbatch update
    (tests/test_models.py grad-accum equivalence)."""
    grad_fn = jax.value_and_grad(loss_fn_aux, has_aux=True)
    A = gradient_accumulation_steps

    if A <= 1:
        def step(state: TrainState, frozen, batch, rng):
            (loss, metrics), grads = grad_fn(state.params, frozen,
                                             batch, rng)
            state = state.apply_gradients(grads)
            return state, {"loss": loss, **metrics}

        return step

    def accum_step(state: TrainState, frozen, batch, rng):
        def reshape(x):
            return x.reshape(A, x.shape[0] // A, *x.shape[1:])

        micro = jax.tree_util.tree_map(reshape, batch)
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        m_tmpl = jax.eval_shape(
            lambda p, f, b, r: loss_fn_aux(p, f, b, r)[1],
            state.params, frozen, first, rng)

        def body(carry, inp):
            acc, loss_sum, msum = carry
            mb, mb_rng = inp
            (loss, metrics), grads = grad_fn(state.params, frozen, mb,
                                             mb_rng)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            msum = jax.tree_util.tree_map(jnp.add, msum, metrics)
            return (acc, loss_sum + loss, msum), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        mzero = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), m_tmpl)
        rngs = jax.random.split(rng, A)
        (grads, loss_sum, msum), _ = jax.lax.scan(
            body, (zero, jnp.asarray(0.0, jnp.float32), mzero),
            (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        state = state.apply_gradients(grads)
        metrics = jax.tree_util.tree_map(lambda m: m / A, msum)
        return state, {"loss": loss_sum / A, **metrics}

    return accum_step


@dataclasses.dataclass(frozen=True)
class VTOStepConfig:
    uncond_fraction: float = 0.2
    num_vstar: int = 16
    text_usage: str = "inversion_adapter"  # | 'noun_chunks' | 'none'
    cloth_input_type: str = "warped"  # | 'none'
    train_inversion_adapter: bool = False
    num_train_timesteps: int = 1000
    gradient_accumulation_steps: int = 1


def make_vto_train_step(
    *,
    unet,
    vae,
    text_model,
    noise_scheduler: DDPMScheduler,
    config: VTOStepConfig,
    inversion_adapter=None,
    empty_prompt_ids: Optional[jax.Array] = None,
) -> Callable:
    """Build the extended-UNet training step.

    The returned ``step(state, frozen, batch, rng)`` expects:
    * ``state.params``: {'unet': ..., 'adapter': ...?} trainables
    * ``frozen``: {'vae': ..., 'text': ..., 'adapter': ...?} frozen vars
    * ``batch``: image, im_mask, inpaint_mask (B,H,W,1), pose_map
      (B,H,W,18), warped_cloth, input_ids (B,77), and for
      inversion-adapter mode ``clip_cloth_features`` (B,S,D_vision).
    """
    cfg = config

    def loss_fn(trainable, frozen, batch, rng):
        rngs = jax.random.split(rng, 6)
        image = batch["image"]
        B = image.shape[0]
        H, W = image.shape[1], image.shape[2]
        lh, lw = H // 8, W // 8
        sf = vae.config.scaling_factor

        from ladi_vton_tpu.models.vae import DiagonalGaussian

        moments, _ = vae.apply(frozen["vae"], image, method="encode")
        latents = DiagonalGaussian(moments).sample(rngs[0]) * sf

        noise = jax.random.normal(rngs[1], latents.shape, latents.dtype)
        timesteps = jax.random.randint(rngs[2], (B,), 0,
                                       cfg.num_train_timesteps)
        noisy_latents = noise_scheduler.add_noise(latents, noise, timesteps)

        pose_map = resize_bilinear(batch["pose_map"], (lh, lw))
        mask = resize_nearest(batch["inpaint_mask"], (lh, lw))

        m_moments, _ = vae.apply(frozen["vae"], batch["im_mask"],
                                 method="encode")
        masked_latents = DiagonalGaussian(m_moments).sample(rngs[3]) * sf

        if cfg.cloth_input_type == "warped":
            c_moments, _ = vae.apply(frozen["vae"], batch["warped_cloth"],
                                     method="encode")
            cloth_latents = DiagonalGaussian(c_moments).sample(rngs[4]) * sf
        else:
            cloth_latents = None

        input_ids = batch["input_ids"]
        # unconditioning dropout (reference :596-604)
        if cfg.uncond_fraction > 0:
            du = jax.random.uniform(rngs[5], (3, B))
            drop_text = du[0] < cfg.uncond_fraction
            drop_cloth = du[1] < cfg.uncond_fraction
            drop_pose = du[2] < cfg.uncond_fraction
            if empty_prompt_ids is not None:
                input_ids = jnp.where(drop_text[:, None],
                                      empty_prompt_ids[None, :], input_ids)
            pose_map = jnp.where(drop_pose[:, None, None, None],
                                 jnp.zeros_like(pose_map), pose_map)
            if cloth_latents is not None:
                cloth_latents = jnp.where(drop_cloth[:, None, None, None],
                                          jnp.zeros_like(cloth_latents),
                                          cloth_latents)

        # text encoding (+ PTE injection)
        if cfg.text_usage == "inversion_adapter":
            adapter_vars = (trainable["adapter"]
                            if cfg.train_inversion_adapter
                            else frozen["adapter"])
            word_embeddings = inversion_adapter.apply(
                adapter_vars, batch["clip_cloth_features"])
            embeds = text_model.apply(frozen["text"], input_ids,
                                      method="embed")
            embeds = splice_word_embeddings(embeds, input_ids,
                                            word_embeddings.reshape(
                                                B, cfg.num_vstar, -1),
                                            cfg.num_vstar)
            ehs, _ = text_model.apply(frozen["text"], embeds, input_ids,
                                      method="forward_embeds")
        else:
            ehs, _ = text_model.apply(frozen["text"], input_ids)

        parts = [noisy_latents, mask.astype(noisy_latents.dtype),
                 masked_latents, pose_map.astype(noisy_latents.dtype)]
        if cloth_latents is not None:
            parts.append(cloth_latents)
        unet_input = jnp.concatenate(parts, axis=-1)

        pred = unet.apply(trainable["unet"], unet_input, timesteps, ehs)
        loss = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - noise.astype(jnp.float32))
        )
        return loss

    return build_train_step(
        lambda p, f, b, r: (loss_fn(p, f, b, r), {}),
        cfg.gradient_accumulation_steps)


def make_emasc_train_step(*, vae, emasc, vgg, int_layers=(1, 2, 3, 4, 5),
                          vgg_weight: float = 0.5,
                          gradient_accumulation_steps: int = 1) -> Callable:
    """EMASC training step (reference src/train_emasc.py:386-418).

    L1(recon, image) + vgg_weight * VGG, VAE frozen; recon decodes the
    *person image* latents with masked-feature injection from the
    *masked* person encode.
    """
    from ladi_vton_tpu.models.vae import DiagonalGaussian
    from ladi_vton_tpu.models.vgg import vgg_loss

    def loss_fn(trainable, frozen, batch, rng):
        image = batch["image"]
        moments, _ = vae.apply(frozen["vae"], image, method="encode")
        latents = DiagonalGaussian(moments).sample(rng)

        _, feats = vae.apply(frozen["vae"], batch["im_mask"],
                             method="encode")
        selected = [feats[i] for i in int_layers]
        adapted = emasc.apply(trainable["emasc"], selected)
        adapted = mask_features(adapted, batch["inpaint_mask"])

        recon = vae.apply(frozen["vae"], latents, adapted,
                          tuple(int_layers), method="decode")
        l1 = jnp.mean(jnp.abs(recon.astype(jnp.float32)
                              - image.astype(jnp.float32)))
        perceptual = vgg_loss(vgg, frozen["vgg"], recon, image)
        return l1 + vgg_weight * perceptual, {"l1": l1, "vgg": perceptual}

    return build_train_step(loss_fn, gradient_accumulation_steps)


def _zero1_leaf_spec(shape, n_shards: int):
    """PartitionSpec sharding the LARGEST mesh-divisible axis on
    ``data`` (replicated when nothing divides — scalars, tiny axes)."""
    from jax.sharding import PartitionSpec as P

    best_ax, best_size = None, 0
    for ax, size in enumerate(shape):
        if size % n_shards == 0 and size > best_size:
            best_ax, best_size = ax, size
    if best_ax is None:
        return P()
    spec = [None] * len(shape)
    spec[best_ax] = "data"
    return P(*spec)


def zero1_state_sharding(state, mesh):
    """ZeRO-1-style sharding tree for a TrainState: parameters stay
    replicated (every chip needs them each forward), optimizer state
    (the Adam moments — 2x the parameter bytes in fp32) is sharded over
    the ``data`` axis.  Under jit, XLA's SPMD partitioner turns the
    optimizer update into a sharded computation with a reduce-scatter /
    all-gather pair riding ICI — the scaling trick the reference's
    accelerate-DDP setup (src/train_vto.py:434-442) has no equivalent
    for.  For the 0.87B-param extended UNet this moves ~7 GB of Adam
    state off every chip on a v5e-8.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def leaf(x):
        return NamedSharding(mesh, _zero1_leaf_spec(x.shape, n))

    return state.replace(
        step=repl,
        params=jax.tree_util.tree_map(lambda x: repl, state.params),
        opt_state=jax.tree_util.tree_map(leaf, state.opt_state),
    )


def shard_step(step_fn: Callable, mesh, *, state=None,
               zero1: bool = False) -> tuple[Callable, Callable]:
    """jit a step over a mesh: batch data-sharded, params replicated.

    XLA turns the mean-loss gradient into a ``psum`` over the ``data``
    axis — the DDP/NCCL all-reduce equivalent, riding ICI.

    ``zero1=True`` (requires the concrete ``state``) additionally
    shards the optimizer state across the data axis
    (``zero1_state_sharding``); pass the returned sharding to
    ``jax.device_put(state, ...)`` or let the jitted step reshard on
    first call.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))  # leading axis sharded

    state_sharding = repl
    if zero1:
        if state is None:
            raise ValueError("zero1=True needs the concrete state")
        state_sharding = zero1_state_sharding(state, mesh)

    def shard_batch_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), tree)

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sharding, repl, data, repl),
        out_shardings=(state_sharding, repl),
        donate_argnums=(0,),
    )
    return jitted, shard_batch_tree
