"""Inversion adapter: CLIP vision features -> pseudo-word token embeddings.

Maps the CLIP ViT-H/14 vision ``last_hidden_state`` to ``num_vstar`` (16)
pseudo-word embeddings in CLIP text space (reference:
src/models/inversion_adapter.py:22-28): N extra CLIP encoder layers ->
CLS token -> post-LayerNorm -> MLP (Linear-GELU-Dropout x2 -> Linear).
Dims for SD-2: input 1280, hidden 5120 (reference hubconf.py:19-23),
output 1024 * 16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladi_vton_tpu.models.clip import CLIPEncoderLayer, CLIPVisionConfig


class InversionAdapter(nn.Module):
    input_dim: int = 1280
    hidden_dim: int = 5120
    output_dim: int = 1024 * 16
    num_encoder_layers: int = 1
    dropout: float = 0.5
    vision_config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.vision_config
        for i in range(self.num_encoder_layers):
            x = CLIPEncoderLayer(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_attention_heads,
                intermediate_size=cfg.intermediate_size,
                hidden_act=cfg.hidden_act,
                causal=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"encoder_layers_{i}",
            )(x)
        x = x[:, 0, :]  # CLS token
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="post_layernorm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="layers_0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="layers_3")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="layers_6")(x)
        return x
