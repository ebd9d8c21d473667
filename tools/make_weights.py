"""Synthesize reference-layout checkpoints (random init, full SD-2 size)
for full-scale CLI drives without downloaded weights.

Writes:
  /tmp/weights/sd2/vae/diffusion_pytorch_model.bin
  /tmp/weights/sd2/text_encoder/pytorch_model.bin
  /tmp/weights/clip_vision/pytorch_model.bin
  /tmp/weights/ladi/{unet,emasc,inversion_adapter,warping}_dresscode.pth
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import torch

# the axon jax-import hook force-sets jax_platforms="axon,cpu"; re-pin
# at the config level so backend init never touches the TPU relay
jax.config.update("jax_platforms", "cpu")

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

W = Path("/tmp/weights")
rng = jax.random.key(0)


def done(name, t0):
    print(f"{name}: {time.time()-t0:.0f}s", flush=True)


t0 = time.time()
if True:
    pass
from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

vae = AutoencoderKL(VAEConfig())
v = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)))
(W / "sd2" / "vae").mkdir(parents=True, exist_ok=True)
p = W / "sd2" / "vae" / "diffusion_pytorch_model.bin"
if not p.exists():
    export_torch_state(v, p)
done("vae", t0)

t0 = time.time()
from ladi_vton_tpu.models.clip import (
    CLIPTextModel,
    CLIPVisionModel,
    sd2_text_config,
    vit_h_vision_config,
)

txt = CLIPTextModel(sd2_text_config())
v = jax.jit(txt.init)(rng, jnp.zeros((1, 77), jnp.int32))
(W / "sd2" / "text_encoder").mkdir(parents=True, exist_ok=True)
p = W / "sd2" / "text_encoder" / "pytorch_model.bin"
if not p.exists():
    export_torch_state(v, p, key_map=clip_text_torch_key_map)
done("text", t0)

t0 = time.time()
vis = CLIPVisionModel(vit_h_vision_config())
v = jax.jit(vis.init)(rng, jnp.zeros((1, 224, 224, 3)))
(W / "clip_vision").mkdir(parents=True, exist_ok=True)
p = W / "clip_vision" / "pytorch_model.bin"
if not p.exists():
    export_torch_state(v, p, key_map=clip_vision_torch_key_map)
done("vision", t0)

t0 = time.time()
from ladi_vton_tpu.models.unet_condition import (
    UNet2DCondition,
    sd2_unet_config,
)

unet = UNet2DCondition(sd2_unet_config(9), attn_impl="xla")
v = jax.jit(unet.init)(rng, jnp.zeros((1, 64, 48, 9)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)))
(W / "ladi").mkdir(parents=True, exist_ok=True)
export_torch_state(v, W / "ladi" / "unet_dresscode.pth",
                   key_map=unet_torch_key_map)
done("unet", t0)

t0 = time.time()
from ladi_vton_tpu.models.emasc import EMASC

em = EMASC()
v = jax.jit(em.init)(rng, [jnp.zeros((1, 8, 8, c))
                           for c in (128, 128, 128, 256, 512)])
p = W / "ladi" / "emasc_dresscode.pth"
if not p.exists():
    export_torch_state(v, p, key_map=emasc_torch_key_map)
done("emasc", t0)

t0 = time.time()
from ladi_vton_tpu.models.inversion_adapter import InversionAdapter

ia = InversionAdapter(input_dim=1280, hidden_dim=1280 * 4,
                      output_dim=1024 * 16, num_encoder_layers=1,
                      vision_config=vit_h_vision_config())
v = jax.jit(ia.init)(rng, jnp.zeros((1, 257, 1280)))
export_torch_state(v, W / "ladi" / "inversion_adapter_dresscode.pth",
                   key_map=inversion_adapter_torch_key_map)
done("adapter", t0)

t0 = time.time()
from ladi_vton_tpu.models.refinement import UNetVanilla
from ladi_vton_tpu.models.tps import ConvNetTPS

tps = ConvNetTPS(height=256, width=192, input_nc_b=21)
v_tps = jax.jit(tps.init)(rng, jnp.zeros((1, 256, 192, 3)),
                          jnp.zeros((1, 256, 192, 21)))
ref = UNetVanilla(out_channels=3, bilinear=True)
v_ref = jax.jit(ref.init)(rng, jnp.zeros((1, 256, 192, 24)))
tps_state = export_torch_state(v_tps, "/tmp/_tps.pth",
                               key_map=tps_torch_key_map)
ref_state = export_torch_state(v_ref, "/tmp/_ref.pth",
                               key_map=refinement_torch_key_map)
torch.save({"tps": tps_state, "refinement": ref_state},
           W / "ladi" / "warping_dresscode.pth")
done("warping", t0)
# minimal CLIP BPE tokenizer: byte vocab in bytes_to_unicode insertion
# order puts "$</w>" at id 259 (the PTE splice token the reference
# hardcodes — encode_text_word_embedding.py:12-35), specials at
# 49406/49407; zero merges (byte-level BPE) is enough for the fixed
# prompt templates.
import json

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
print("all weights + tokenizer written to", W, flush=True)
