"""CLIP text encoding with pseudo-token-embedding (PTE) injection.

Re-expression of the reference's embedding surgery (reference:
src/utils/encode_text_word_embedding.py:6-72): the prompt template
contains ``num_vstar`` consecutive ``$`` tokens (CLIP vocab id 259); the
token embeddings at the first ``$`` run are replaced by the inversion
adapter's predicted embeddings before the causal encoder runs.

The torch original does a fancy-index scatter; here it is a vectorized
one-hot blend — fully differentiable w.r.t. the adapter output, which
``--train_inversion_adapter`` requires (reference src/train_vto.py:
346-347), and free of dynamic shapes so it jits cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VSTAR_TOKEN_ID = 259  # '$' in the CLIP BPE vocab


def splice_word_embeddings(
    input_embeds: jax.Array,
    input_ids: jax.Array,
    word_embeddings: jax.Array,
    num_vstar: int,
) -> jax.Array:
    """Replace the first run of ``$`` embeddings with ``word_embeddings``.

    input_embeds: (B, S, D); input_ids: (B, S);
    word_embeddings: (B, num_vstar, D) or (B, num_vstar * D).
    Sequences without ``$`` pass through untouched (the reference skips
    them via its ``existing_indexes`` filter).
    """
    B, S, D = input_embeds.shape
    ptes = word_embeddings.reshape(B, num_vstar, D).astype(input_embeds.dtype)

    is_vstar = input_ids == VSTAR_TOKEN_ID
    has_vstar = jnp.any(is_vstar, axis=1)  # (B,)
    first = jnp.argmax(is_vstar, axis=1)  # (B,)

    targets = first[:, None] + jnp.arange(num_vstar)[None, :]  # (B, V)
    pos = jnp.arange(S)[None, None, :]  # (1, 1, S)
    match = pos == targets[:, :, None]  # (B, V, S)

    replacement = jnp.einsum(
        "bvs,bvd->bsd", match.astype(input_embeds.dtype), ptes
    )
    replaced_mask = (
        jnp.any(match, axis=1) & has_vstar[:, None]
    )  # (B, S)
    return jnp.where(replaced_mask[..., None], replacement, input_embeds)


def encode_text_word_embedding(
    text_model,
    text_params,
    input_ids: jax.Array,
    word_embeddings: jax.Array,
    num_vstar: int = 16,
):
    """Full PTE-injected CLIP text forward.

    ``text_model``/``text_params`` are a ``models.clip.CLIPTextModel`` and
    its variables.  Returns (last_hidden_state, pooled_output) like the
    reference's BaseModelOutputWithPooling fields.
    """
    embeds = text_model.apply(text_params, input_ids, method="embed")
    embeds = splice_word_embeddings(embeds, input_ids, word_embeddings,
                                    num_vstar)
    return text_model.apply(
        text_params, embeds, input_ids, method="forward_embeds"
    )
