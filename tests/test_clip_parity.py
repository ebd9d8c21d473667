"""Numeric parity: our CLIP towers + converter vs transformers (torch).

Builds small randomly-initialized torch CLIP models from config (no
downloads), converts their state dicts with hub.convert, and compares
forward outputs — the same path published SD-2/ViT-H weights take.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from ladi_vton_tpu.hub.convert import convert_clip_text, convert_clip_vision
from ladi_vton_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
)


def test_clip_text_parity_with_transformers():
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    hf_cfg = HFTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="gelu")
    torch.manual_seed(0)
    hf_model = HFTextModel(hf_cfg).eval()
    state = {k: v.detach().numpy()
             for k, v in hf_model.state_dict().items()}

    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="gelu"))
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_clip_text(state))

    ids = np.array([[3, 5, 259, 259, 17, 999, 0, 0]], np.int64)
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(ids)).last_hidden_state.numpy()
    mine, _ = ours.apply(variables, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(mine), theirs, rtol=1e-3,
                               atol=1e-4)


def test_clip_vision_parity_with_transformers():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModel as HFVisionModel

    hf_cfg = HFVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu")
    torch.manual_seed(1)
    hf_model = HFVisionModel(hf_cfg).eval()
    state = {k: v.detach().numpy()
             for k, v in hf_model.state_dict().items()}

    ours = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu"))
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_clip_vision(state))

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = hf_model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).last_hidden_state.numpy()
    mine = ours.apply(variables, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(mine), theirs, rtol=1e-3,
                               atol=1e-4)


def test_pte_injected_encode_matches_manual_splice():
    """encode_text_word_embedding == manual embedding surgery + forward."""
    from ladi_vton_tpu.diffusion.text import encode_text_word_embedding

    cfg = CLIPTextConfig(vocab_size=300, hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=12)
    model = CLIPTextModel(cfg)
    ids = np.zeros((1, 12), np.int32)
    ids[0, 0] = 49  # bos-ish
    ids[0, 2:4] = 259
    ids_j = jnp.asarray(ids)
    params = model.init(jax.random.key(0), ids_j)

    ptes = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 32)
                                                 ).astype(np.float32))
    out, _ = encode_text_word_embedding(model, params, ids_j, ptes,
                                        num_vstar=2)

    # manual: embed, overwrite positions 2..3, forward
    embeds = model.apply(params, ids_j, method="embed")
    embeds = embeds.at[0, 2:4].set(ptes[0])
    expect, _ = model.apply(params, embeds, ids_j,
                            method="forward_embeds")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)
