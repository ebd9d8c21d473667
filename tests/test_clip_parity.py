"""Numeric parity: our CLIP towers + converter vs transformers (torch).

Builds small randomly-initialized torch CLIP models from config (no
downloads), converts their state dicts with hub.convert, and compares
forward outputs — the same path published SD-2/ViT-H weights take.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_pte_splice_matches_reference_function():
    """Our PTE-injected text encode vs the reference's ACTUAL
    encode_text_word_embedding (torch fancy-index scatter over
    transformers CLIP internals, /root/reference/src/utils/
    encode_text_word_embedding.py) on converted weights.  The two
    private APIs the reference uses that transformers 4.57 removed
    (`_build_causal_attention_mask`, buffer-registered `position_ids`)
    are shimmed with their modern equivalents."""
    import sys
    from pathlib import Path

    REFERENCE = Path("/root/reference")
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")

    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel
    from transformers.modeling_attn_mask_utils import (
        _create_4d_causal_attention_mask,
    )

    from ladi_vton_tpu.diffusion.text import encode_text_word_embedding

    hf_cfg = HFTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu")
    torch.manual_seed(2)
    hf_model = HFTextModel(hf_cfg).eval()
    tm = hf_model.text_model
    tm._build_causal_attention_mask = (
        lambda bsz, seq, dtype: _create_4d_causal_attention_mask(
            (bsz, seq), dtype, device=torch.device("cpu")))
    if not hasattr(tm.embeddings, "position_ids"):
        tm.embeddings.position_ids = torch.arange(16)[None]
    orig_encoder = tm.encoder

    class _EncoderShim:  # transformers 4.57 dropped return_dict
        def __call__(self, **kw):
            kw.pop("return_dict", None)
            return orig_encoder(**kw)

    object.__setattr__(tm, "encoder", _EncoderShim())

    sys.path.insert(0, str(REFERENCE))
    try:
        from src.utils.encode_text_word_embedding import (
            encode_text_word_embedding as ref_fn,
        )
    finally:
        sys.path.remove(str(REFERENCE))

    num_vstar = 3
    # row 0: a '$' run; row 1: no '$' at all (selective-replacement path)
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = 490
    ids[0, 4:4 + num_vstar] = 259
    ids[0, 9] = 999
    ids[1, 1:5] = (7, 8, 9, 10)
    we = np.random.default_rng(22).standard_normal(
        (2, num_vstar, 64)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_fn(hf_model, torch.from_numpy(ids),
                         torch.from_numpy(we),
                         num_vstar=num_vstar).last_hidden_state.numpy()

    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu"))
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_clip_text(state))
    mine, _ = encode_text_word_embedding(
        ours, variables, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(we), num_vstar=num_vstar)
    np.testing.assert_allclose(np.asarray(mine), ref_out, rtol=1e-3,
                               atol=1e-4)
