"""Synthesize reference-layout checkpoints (random init) for CLI drives
without downloaded weights.

Two modes:

* full (default): SD-2-sized towers — exercises the real conversion
  paths at scale (slow on the 1-core CPU; minutes).
* ``--tiny``: small towers in the SAME file layout, each carrying its
  architecture next to the weights — diffusers/transformers-style
  ``config.json`` inside the model dirs (exactly what real downloaded
  SD-2 checkouts ship) and ``<name>_<dataset>.config.json`` sidecars
  next to the ``.pth`` releases (which have no config channel in the
  reference; hubconf.py hard-codes their architectures).  ``hub.zoo``
  reads both, so ``cli.inference``/``cli.eval`` run end-to-end on these
  in seconds (tests/test_cli_mains.py).

Layout under OUT (default /tmp/weights):
  sd2/vae/{diffusion_pytorch_model.bin,config.json}
  sd2/text_encoder/{pytorch_model.bin,config.json}
  sd2/tokenizer/{vocab.json,merges.txt}
  clip_vision/{pytorch_model.bin,config.json}
  ladi/{unet,emasc,inversion_adapter,warping}_<dataset>.pth (+sidecars)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp

# the axon jax-import hook force-sets jax_platforms="axon,cpu"; re-pin
# at the config level so backend init never touches the TPU relay
jax.config.update("jax_platforms", "cpu")


def _write_json(path: Path, obj: dict):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def make_weights(out_dir="/tmp/weights", *, tiny: bool = False,
                 dataset: str = "dresscode", seed: int = 0,
                 verbose: bool = True) -> Path:
    """Write the full weight set; returns the output root."""
    import torch

    from ladi_vton_tpu.core.checkpoint import (
        clip_text_torch_key_map,
        clip_vision_torch_key_map,
        emasc_torch_key_map,
        export_torch_state,
        inversion_adapter_torch_key_map,
        refinement_torch_key_map,
        tps_torch_key_map,
        unet_torch_key_map,
    )
    from ladi_vton_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
        sd2_text_config,
        vit_h_vision_config,
    )
    from ladi_vton_tpu.models.emasc import EMASC
    from ladi_vton_tpu.models.inversion_adapter import InversionAdapter
    from ladi_vton_tpu.models.refinement import UNetVanilla
    from ladi_vton_tpu.models.tps import ConvNetTPS
    from ladi_vton_tpu.models.unet_condition import (
        UNet2DCondition,
        UNetConfig,
        sd2_unet_config,
    )
    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

    W = Path(out_dir)
    rng = jax.random.key(seed)

    def log(name, t0):
        if verbose:
            print(f"{name}: {time.time()-t0:.0f}s", flush=True)

    if tiny:
        vae_cfg = VAEConfig(block_out_channels=(32, 32, 64, 64))
        # .pth carries the stock (pre-surgery) 9ch unet like the full
        # mode: zoo widens conv_in to the sidecar's in_channels, so the
        # tiny drive exercises the 9->31 surgery too
        unet_cfg = UNetConfig(in_channels=9,
                              block_out_channels=(32, 64, 64, 64),
                              head_dim=8, cross_attention_dim=64)
        text_cfg = CLIPTextConfig(hidden_size=64, num_hidden_layers=2,
                                  num_attention_heads=4,
                                  intermediate_size=128)
        vision_cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                                      num_attention_heads=2,
                                      intermediate_size=64, patch_size=32)
        emasc_in = (32, 32, 32, 32, 64)
        emasc_out = (32, 32, 64, 64, 64)
        num_vstar = 16
        adapter_dims = dict(input_dim=32, hidden_dim=64,
                            output_dim=64 * num_vstar)
    else:
        vae_cfg, unet_cfg = VAEConfig(), sd2_unet_config(9)
        text_cfg, vision_cfg = sd2_text_config(), vit_h_vision_config()
        emasc_in = (128, 128, 128, 256, 512)
        emasc_out = (128, 256, 512, 512, 512)
        adapter_dims = dict(input_dim=1280, hidden_dim=1280 * 4,
                            output_dim=1024 * 16)

    # ---- VAE (+ diffusers-style config.json)
    t0 = time.time()
    vae = AutoencoderKL(vae_cfg)
    v = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)))
    p = W / "sd2" / "vae" / "diffusion_pytorch_model.bin"
    p.parent.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        export_torch_state(v, p)
    _write_json(W / "sd2" / "vae" / "config.json", {
        "_class_name": "AutoencoderKL",
        "in_channels": vae_cfg.in_channels,
        "out_channels": vae_cfg.out_channels,
        "latent_channels": vae_cfg.latent_channels,
        "block_out_channels": list(vae_cfg.block_out_channels),
        "layers_per_block": vae_cfg.layers_per_block,
        "norm_num_groups": vae_cfg.norm_num_groups,
        "scaling_factor": vae_cfg.scaling_factor,
    })
    log("vae", t0)

    # ---- text encoder (+ transformers-style config.json)
    t0 = time.time()
    txt = CLIPTextModel(text_cfg)
    v = jax.jit(txt.init)(
        rng, jnp.zeros((1, text_cfg.max_position_embeddings), jnp.int32))
    p = W / "sd2" / "text_encoder" / "pytorch_model.bin"
    p.parent.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        export_torch_state(v, p, key_map=clip_text_torch_key_map)
    _write_json(W / "sd2" / "text_encoder" / "config.json", {
        "architectures": ["CLIPTextModel"],
        **dataclasses.asdict(text_cfg),
    })
    log("text", t0)

    # ---- CLIP vision tower
    t0 = time.time()
    vis = CLIPVisionModel(vision_cfg)
    v = jax.jit(vis.init)(
        rng, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size,
                        3)))
    p = W / "clip_vision" / "pytorch_model.bin"
    p.parent.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        export_torch_state(v, p, key_map=clip_vision_torch_key_map)
    _write_json(W / "clip_vision" / "config.json", {
        "architectures": ["CLIPVisionModelWithProjection"],
        "vision_config": dataclasses.asdict(vision_cfg),
    })
    log("vision", t0)

    # ---- extended UNet release .pth (stock 9ch; zoo does the surgery)
    t0 = time.time()
    unet = UNet2DCondition(unet_cfg, attn_impl="xla")
    v = jax.jit(unet.init)(
        rng, jnp.zeros((1, 64, 48, unet_cfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    ladi = W / "ladi"
    ladi.mkdir(parents=True, exist_ok=True)
    export_torch_state(v, ladi / f"unet_{dataset}.pth",
                       key_map=unet_torch_key_map)
    # stock UNet also under sd2/unet (diffusers layout) — the trainer
    # CLIs load the pre-surgery weights from the SD-2 model dir
    # (reference train_vto.py:243-258 from_pretrained)
    p = W / "sd2" / "unet" / "diffusion_pytorch_model.bin"
    p.parent.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        export_torch_state(v, p, key_map=unet_torch_key_map)
    _write_json(W / "sd2" / "unet" / "config.json", {
        "_class_name": "UNet2DConditionModel",
        "in_channels": unet_cfg.in_channels,
        "block_out_channels": list(unet_cfg.block_out_channels),
        "layers_per_block": unet_cfg.layers_per_block,
        "head_dim": unet_cfg.head_dim,
        "cross_attention_dim": unet_cfg.cross_attention_dim,
    })
    if tiny:
        _write_json(ladi / f"unet_{dataset}.config.json", {
            "in_channels": 31,
            "block_out_channels": list(unet_cfg.block_out_channels),
            "layers_per_block": unet_cfg.layers_per_block,
            "head_dim": unet_cfg.head_dim,
            "cross_attention_dim": unet_cfg.cross_attention_dim,
        })
    log("unet", t0)

    # ---- EMASC release .pth
    t0 = time.time()
    em = EMASC(in_channels=emasc_in, out_channels=emasc_out)
    v = jax.jit(em.init)(rng, [jnp.zeros((1, 8, 8, c))
                               for c in emasc_in])
    p = ladi / f"emasc_{dataset}.pth"
    if not p.exists():
        export_torch_state(v, p, key_map=emasc_torch_key_map)
    if tiny:
        _write_json(ladi / f"emasc_{dataset}.config.json", {
            "in_channels": list(emasc_in),
            "out_channels": list(emasc_out),
        })
    log("emasc", t0)

    # ---- inversion adapter release .pth
    t0 = time.time()
    ia = InversionAdapter(**adapter_dims, num_encoder_layers=1,
                          vision_config=vision_cfg)
    n_tokens = (vision_cfg.image_size // vision_cfg.patch_size) ** 2 + 1
    v = jax.jit(ia.init)(
        rng, jnp.zeros((1, n_tokens, adapter_dims["input_dim"])))
    export_torch_state(v, ladi / f"inversion_adapter_{dataset}.pth",
                       key_map=inversion_adapter_torch_key_map)
    if tiny:
        _write_json(ladi / f"inversion_adapter_{dataset}.config.json", {
            **adapter_dims, "num_encoder_layers": 1,
            "vision_config": dataclasses.asdict(vision_cfg),
        })
    log("adapter", t0)

    # ---- warping bundle (TPS + refinement are the reference's fixed
    # small architectures — same size in both modes)
    t0 = time.time()
    tps = ConvNetTPS(height=256, width=192, input_nc_b=21)
    v_tps = jax.jit(tps.init)(rng, jnp.zeros((1, 256, 192, 3)),
                              jnp.zeros((1, 256, 192, 21)))
    ref = UNetVanilla(out_channels=3, bilinear=True)
    v_ref = jax.jit(ref.init)(rng, jnp.zeros((1, 256, 192, 24)))
    tps_state = export_torch_state(v_tps, None, key_map=tps_torch_key_map)
    ref_state = export_torch_state(v_ref, None,
                                   key_map=refinement_torch_key_map)
    torch.save({"tps": tps_state, "refinement": ref_state},
               ladi / f"warping_{dataset}.pth")
    log("warping", t0)

    # ---- minimal CLIP BPE tokenizer: byte vocab in bytes_to_unicode
    # insertion order puts "$</w>" at id 259 (the PTE splice token the
    # reference hardcodes — encode_text_word_embedding.py:12-35),
    # specials at 49406/49407; zero merges (byte-level BPE) is enough
    # for the fixed prompt templates.
    from ladi_vton_tpu.utils.tokenizer import _bytes_to_unicode

    syms = list(_bytes_to_unicode().values())
    vocab, i = {}, 0
    for s_ in syms:
        if s_ not in vocab:
            vocab[s_] = i
            i += 1
    for s_ in syms:
        if s_ + "</w>" not in vocab:
            vocab[s_ + "</w>"] = i
            i += 1
    assert vocab["$</w>"] == 259
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    tok = W / "sd2" / "tokenizer"
    tok.mkdir(parents=True, exist_ok=True)
    with open(tok / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tok / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    if verbose:
        print(f"all weights + tokenizer written to {W} "
              f"({'tiny' if tiny else 'full'} mode)", flush=True)
    return W


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/weights")
    ap.add_argument("--tiny", action="store_true",
                    help="small towers + config sidecars (seconds, "
                         "for CLI-main drives)")
    ap.add_argument("--dataset", default="dresscode",
                    choices=["dresscode", "vitonhd"])
    args = ap.parse_args()
    make_weights(args.out, tiny=args.tiny, dataset=args.dataset)
