"""CLIP text & vision towers (Flax, NHWC-friendly).

The reference loads frozen encoders from transformers: the SD-2 CLIP
text encoder/tokenizer and the laion CLIP ViT-H/14 vision encoder
(reference: src/inference.py:125-129, src/train_vto.py:252-257,316-321).
These are ground-up Flax implementations with parameter names chosen to
map 1:1 from the published torch checkpoints via ``hub.convert``.

Text model semantics needed by the framework:
* plain encode (prompt -> last_hidden_state) for training/inference
* ``forward_embeds`` taking externally assembled input embeddings — the
  hook for pseudo-token injection (``diffusion.text``, mirroring
  reference src/utils/encode_text_word_embedding.py).

Configs: SD-2 text = 1024 hidden / 23 layers / 16 heads / gelu;
SD-1.5 text = 768 / 12 / 12 / quick_gelu; ViT-H/14 vision = 1280 hidden /
32 layers / 16 heads / patch 14 @ 224.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 14
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5


def sd2_text_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def sd15_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=768, num_hidden_layers=12,
                          num_attention_heads=12, intermediate_size=3072,
                          hidden_act="quick_gelu")


def vit_h_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig()


def vit_l_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(hidden_size=1024, num_hidden_layers=24,
                            intermediate_size=4096, hidden_act="quick_gelu")


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name!r}")


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        head_dim = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        B, S, _ = x.shape
        q = dense("q_proj")(x).reshape(B, S, self.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(B, S, self.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(B, S, self.num_heads, head_dim)
        out = dot_product_attention(q, k, v, causal=self.causal, impl="xla")
        out = out.reshape(B, S, self.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    causal: bool
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = x + CLIPAttention(self.hidden_size, self.num_heads, self.causal,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="self_attn")(ln("layer_norm1")(x))
        h = ln("layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        self.position_embedding = nn.Embed(cfg.max_position_embeddings,
                                           cfg.hidden_size, dtype=self.dtype,
                                           param_dtype=self.param_dtype)
        self.layers = [
            CLIPEncoderLayer(cfg.hidden_size, cfg.num_attention_heads,
                             cfg.intermediate_size, cfg.hidden_act,
                             causal=True, layer_norm_eps=cfg.layer_norm_eps,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                             dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def embed(self, input_ids: jax.Array) -> jax.Array:
        """Token embeddings only (no positions) — PTE splice point."""
        return self.token_embedding(input_ids)

    def forward_embeds(self, inputs_embeds: jax.Array,
                       input_ids: jax.Array):
        """Run positions + causal encoder + final LN over given embeds.

        Mirrors reference src/utils/encode_text_word_embedding.py:37-65.
        Returns (last_hidden_state, pooled_output).
        """
        S = inputs_embeds.shape[1]
        positions = jnp.arange(S)[None, :]
        h = inputs_embeds + self.position_embedding(positions)
        for layer in self.layers:
            h = layer(h)
        h = self.final_layer_norm(h)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = h[jnp.arange(h.shape[0]), eot]
        return h, pooled

    def __call__(self, input_ids: jax.Array):
        return self.forward_embeds(self.embed(input_ids), input_ids)


class CLIPVisionModel(nn.Module):
    """Vision transformer; returns last_hidden_state (B, 1+P, hidden)."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """``pixel_values`` NHWC, CLIP-normalized, (B, 224, 224, 3)."""
        cfg = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="patch_embedding")(
            pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), self.param_dtype)
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (B, 1, cfg.hidden_size))
        h = jnp.concatenate([cls, patches], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(num_pos, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="position_embedding")(
            jnp.arange(num_pos)[None, :])
        h = h + pos
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="pre_layrnorm")(h)
        for i in range(cfg.num_hidden_layers):
            h = CLIPEncoderLayer(cfg.hidden_size, cfg.num_attention_heads,
                                 cfg.intermediate_size, cfg.hidden_act,
                                 causal=False,
                                 layer_norm_eps=cfg.layer_norm_eps,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(h)
        return h
