"""Model zoo: named builders + weight loading (hubconf equivalent).

The reference exposes four torch.hub entry points that build the
architecture and pull a ``.pth`` from the GitHub release
(reference: hubconf.py:16-64).  Here each builder returns
``(module, variables)`` — a Flax module plus converted parameters —
loading from, in order of preference:

1. a local checkpoint path (``checkpoint=...``),
2. a checkpoint directory (``checkpoint_dir/<name>_<dataset>.pth``),
3. the reference's release URL (same files, downloaded only if the
   environment has network access).

SD-2-inpainting tower weights (VAE / text encoder / stock UNet) load
via ``sd2_*`` helpers from a local diffusers-style model directory.
"""

from __future__ import annotations

import os
import urllib.request
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladi_vton_tpu.hub import convert as C
from ladi_vton_tpu.models.clip import (
    CLIPTextModel,
    CLIPVisionModel,
    sd2_text_config,
    vit_h_vision_config,
)
from ladi_vton_tpu.models.emasc import EMASC
from ladi_vton_tpu.models.inversion_adapter import InversionAdapter
from ladi_vton_tpu.models.refinement import UNetVanilla
from ladi_vton_tpu.models.tps import ConvNetTPS
from ladi_vton_tpu.models.unet_condition import UNet2DCondition, sd2_unet_config
from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

RELEASE_URL = "https://github.com/miccunifi/ladi-vton/releases/download/weights"


def _resolve_checkpoint(name: str, dataset: str,
                        checkpoint: Optional[str],
                        checkpoint_dir: Optional[str]) -> str:
    if checkpoint:
        return checkpoint
    fname = f"{name}_{dataset}.pth"
    if checkpoint_dir:
        local = Path(checkpoint_dir) / fname
        if local.exists():
            return str(local)
    cache = Path(os.environ.get("LADI_VTON_CACHE",
                                Path.home() / ".cache" / "ladi_vton_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    target = cache / fname
    if not target.exists():
        url = f"{RELEASE_URL}/{fname}"
        print(f"downloading {url} -> {target}")
        urllib.request.urlretrieve(url, target)
    return str(target)


def _converted_cache_dir() -> Path:
    d = Path(os.environ.get(
        "LADI_VTON_CACHE",
        Path.home() / ".cache" / "ladi_vton_tpu")) / "converted"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _flatten_tree(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_tree(v, kk))
        else:
            out[kk] = np.asarray(v)
    return out


def _unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _cached_convert(src_path, tag: str, fn):
    """torch->flax conversion memoized on disk.

    The conversion (load + transpose every tensor) runs once per
    (source mtime, size); later launches load a single ``.npz`` —
    this cuts CLI startup from minutes to seconds on re-runs
    (cache key includes the source stats, so retrained checkpoints
    reconvert automatically).  Set LADI_VTON_NO_CONVERT_CACHE=1 to
    bypass.
    """
    if os.environ.get("LADI_VTON_NO_CONVERT_CACHE"):
        return fn()
    try:
        st = Path(src_path).stat()
        key = f"{tag}-{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        return fn()
    target = _converted_cache_dir() / f"{key}.npz"
    if target.exists():
        try:
            with np.load(target) as z:
                return _unflatten_tree({k: z[k] for k in z.files})
        except Exception:
            # Corrupt cache entry (e.g. torn write from a crashed
            # process): fall through and reconvert over it.
            pass
    tree = fn()
    # Per-writer temp name: concurrent processes converting the same
    # checkpoint must not interleave writes into one temp file.
    tmp = target.with_name(f"{target.name}.tmp.{os.getpid()}.npz")
    np.savez(tmp, **_flatten_tree(tree))
    tmp.replace(target)  # atomic publish
    return tree


def _sidecar_config(pth_path: str) -> Optional[dict]:
    """Architecture sidecar for a ``.pth`` release.

    The reference's released checkpoints carry no config channel —
    hubconf.py hard-codes their architectures (reference
    hubconf.py:16-64), and so do our builder defaults.  Synthesized
    non-default checkpoints (``tools/make_weights.py --tiny``) write a
    ``<name>.config.json`` next to the ``.pth``; when present it
    overrides the builder's architecture so the SAME CLI path drives
    any scale of tower.
    """
    sidecar = Path(pth_path).with_suffix(".config.json")
    if sidecar.exists():
        import json

        with open(sidecar) as f:
            return json.load(f)
    return None


def _dir_config(model_dir: str, subfolder: str) -> Optional[dict]:
    """diffusers/transformers ``config.json`` from a model directory —
    real downloaded SD-2 checkouts ship one per subfolder (the reference
    consumes it through ``from_pretrained``)."""
    path = Path(model_dir) / subfolder / "config.json"
    if path.exists():
        import json

        with open(path) as f:
            return json.load(f)
    return None


def _config_kwargs(cfg_cls, raw: dict) -> dict:
    """Keep only the keys the dataclass knows; tuple-ify sequences."""
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    out = {}
    for k, v in raw.items():
        if k in fields:
            out[k] = tuple(v) if isinstance(v, list) else v
    return out


def _to_jax(variables: dict, dtype=None) -> dict:
    def cast(x):
        arr = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        return arr

    return jax.tree_util.tree_map(cast, variables)


def extended_unet(dataset: str = "vitonhd", *, checkpoint=None,
                  checkpoint_dir=None, param_dtype=jnp.float32,
                  dtype=jnp.bfloat16):
    """31-channel SD-2 UNet with trained try-on weights
    (reference hubconf.py:30-37).  A ``.config.json`` sidecar next to
    the ``.pth`` overrides the SD-2 architecture (tiny drives)."""
    from ladi_vton_tpu.models.unet_condition import UNetConfig

    path = _resolve_checkpoint("unet", dataset, checkpoint, checkpoint_dir)
    side = _sidecar_config(path)
    cfg = (UNetConfig(**_config_kwargs(UNetConfig, side)) if side
           else sd2_unet_config(31))
    unet = UNet2DCondition(cfg, dtype=dtype, param_dtype=param_dtype)
    variables = _cached_convert(
        path, f"unet{cfg.in_channels}",
        lambda: C.widen_conv_in(C.convert_unet(C.load_torch_state(path)),
                                cfg.in_channels))
    return unet, _to_jax(variables, param_dtype)


def emasc(dataset: str = "vitonhd", *, checkpoint=None, checkpoint_dir=None,
          param_dtype=jnp.float32, dtype=jnp.bfloat16,
          kind: str = "nonlinear", kernel_size: int = 3):
    """EMASC with the reference channel plan (reference
    hubconf.py:40-53); ``kind``/``kernel_size`` mirror eval.py's
    --emasc_type/--emasc_kernel for locally trained variants."""
    path = _resolve_checkpoint("emasc", dataset, checkpoint, checkpoint_dir)
    side = _sidecar_config(path) or {}
    channel_kwargs = {
        k: tuple(side[k]) for k in ("in_channels", "out_channels")
        if k in side
    }
    module = EMASC(kind=kind, kernel_size=kernel_size, dtype=dtype,
                   param_dtype=param_dtype, **channel_kwargs)
    variables = _cached_convert(
        path, f"emasc_{kind}" if kind != "nonlinear" else "emasc",
        lambda: C.convert_emasc(C.load_torch_state(path), kind=kind))
    return module, _to_jax(variables, param_dtype)


def inversion_adapter(dataset: str = "vitonhd", *, checkpoint=None,
                      checkpoint_dir=None, param_dtype=jnp.float32,
                      dtype=jnp.bfloat16, num_encoder_layers: int = 1,
                      num_vstar: int = 16):
    """CLIP ViT-H/14 -> num_vstar PTEs in SD-2 text space
    (reference hubconf.py:16-27)."""
    from ladi_vton_tpu.models.clip import CLIPVisionConfig

    path = _resolve_checkpoint("inversion_adapter", dataset, checkpoint,
                               checkpoint_dir)
    side = _sidecar_config(path) or {}
    vc = (CLIPVisionConfig(**_config_kwargs(CLIPVisionConfig,
                                            side["vision_config"]))
          if "vision_config" in side else vit_h_vision_config())
    module = InversionAdapter(
        input_dim=side.get("input_dim", 1280),
        hidden_dim=side.get("hidden_dim", 1280 * 4),
        output_dim=side.get("output_dim", 1024 * num_vstar),
        num_encoder_layers=side.get("num_encoder_layers",
                                    num_encoder_layers),
        vision_config=vc, dtype=dtype, param_dtype=param_dtype)
    variables = _cached_convert(
        path, "inversion_adapter",
        lambda: C.convert_inversion_adapter(C.load_torch_state(path)))
    return module, _to_jax(variables, param_dtype)


def warping_module(dataset: str = "vitonhd", *, checkpoint=None,
                   checkpoint_dir=None, param_dtype=jnp.float32):
    """(ConvNetTPS, UNetVanilla refinement) with trained weights
    (reference hubconf.py:56-64).  Runs fp32 like the reference
    (src/inference.py:197-198)."""
    path = _resolve_checkpoint("warping", dataset, checkpoint,
                               checkpoint_dir)

    def _convert_bundle():
        import torch

        bundle = torch.load(path, map_location="cpu", weights_only=True)
        tps_state = {k: v.detach().float().numpy()
                     for k, v in bundle["tps"].items()}
        ref_state = {k: v.detach().float().numpy()
                     for k, v in bundle["refinement"].items()}
        return {"tps": C.convert_tps(tps_state),
                "ref": C.convert_refinement(ref_state)}

    both = _cached_convert(path, "warping", _convert_bundle)
    tps = ConvNetTPS(height=256, width=192, input_nc_b=21,
                     param_dtype=param_dtype)
    refinement = UNetVanilla(out_channels=3, bilinear=True,
                             param_dtype=param_dtype)
    return ((tps, _to_jax(both["tps"], param_dtype)),
            (refinement, _to_jax(both["ref"], param_dtype)))


# ---------------------------------------------------------- SD-2 base towers


def _find_model_file(model_dir: str, subfolder: str) -> Path:
    folder = Path(model_dir) / subfolder
    for fname in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                  "diffusion_pytorch_model.safetensors",
                  "model.safetensors"):
        path = folder / fname
        if path.exists():
            return path
    raise FileNotFoundError(f"no checkpoint under {folder}")


def _load_model_dir_state(model_dir: str, subfolder: str):
    """Load a diffusers/transformers subfolder checkpoint to numpy."""
    import torch

    path = _find_model_file(model_dir, subfolder)
    if path.suffix == ".safetensors":
        from safetensors.torch import load_file

        state = load_file(str(path))
    else:
        state = torch.load(str(path), map_location="cpu",
                           weights_only=True)
    return {k: v.detach().float().numpy() for k, v in state.items()}


def sd2_vae(model_dir: str, *, param_dtype=jnp.float32,
            dtype=jnp.bfloat16):
    """EMASC-aware VAE with SD-2-inpainting weights
    (reference src/inference.py:126).  Architecture from the model
    dir's diffusers ``config.json`` when present (real downloaded
    checkouts ship it), SD-2 defaults otherwise."""
    raw = _dir_config(model_dir, "vae")
    cfg = (VAEConfig(**_config_kwargs(VAEConfig, raw)) if raw
           else VAEConfig())
    vae = AutoencoderKL(cfg, dtype=dtype, param_dtype=param_dtype)
    variables = _cached_convert(
        _find_model_file(model_dir, "vae"), "sd2_vae",
        lambda: C.convert_vae(_load_model_dir_state(model_dir, "vae")))
    return vae, _to_jax(variables, param_dtype)


def sd2_unet(model_dir: str, *, in_channels: int = 9,
             param_dtype=jnp.float32):
    """Stock SD-2-inpainting UNet weights from the model dir, with
    optional conv_in widening surgery to ``in_channels`` (reference
    src/train_vto.py:259-277).  Returns ``(config, variables)`` — the
    trainer CLIs build the module themselves (remat control).
    Architecture from the dir's diffusers ``config.json`` when present,
    SD-2 defaults otherwise."""
    import dataclasses

    from ladi_vton_tpu.models.unet_condition import UNetConfig

    raw = _dir_config(model_dir, "unet")
    base = (UNetConfig(**_config_kwargs(UNetConfig, raw)) if raw
            else sd2_unet_config(9))
    cfg = dataclasses.replace(base, in_channels=in_channels)
    variables = _cached_convert(
        _find_model_file(model_dir, "unet"), f"sd2_unet{in_channels}",
        lambda: C.widen_conv_in(
            C.convert_unet(_load_model_dir_state(model_dir, "unet")),
            in_channels))
    return cfg, _to_jax(variables, param_dtype)


def sd2_text_encoder(model_dir: str, *, param_dtype=jnp.float32,
                     dtype=jnp.bfloat16):
    from ladi_vton_tpu.models.clip import CLIPTextConfig

    raw = _dir_config(model_dir, "text_encoder")
    cfg = (CLIPTextConfig(**_config_kwargs(CLIPTextConfig, raw)) if raw
           else sd2_text_config())
    model = CLIPTextModel(cfg, dtype=dtype, param_dtype=param_dtype)
    variables = _cached_convert(
        _find_model_file(model_dir, "text_encoder"), "sd2_text",
        lambda: C.convert_clip_text(
            _load_model_dir_state(model_dir, "text_encoder")))
    return model, _to_jax(variables, param_dtype)


def clip_vision_config(model_dir: Optional[str]):
    """Vision-tower architecture WITHOUT loading weights.

    The inversion adapter's encoder layer + projection dims are functions
    of the vision tower (reference hubconf.py:16-27 hard-codes ViT-H/14);
    trainer CLIs call this so tiny/custom towers drive the same code path
    (``--use_clip_cloth_features`` loads no weights but still needs dims).
    """
    from ladi_vton_tpu.models.clip import CLIPVisionConfig

    raw = _dir_config(model_dir, "") if model_dir else None
    if raw is not None:
        raw = raw.get("vision_config", raw)
        return CLIPVisionConfig(**_config_kwargs(CLIPVisionConfig, raw))
    return vit_h_vision_config()


def clip_vit_h_vision(model_dir: str, *, param_dtype=jnp.float32,
                      dtype=jnp.bfloat16):
    """laion/CLIP-ViT-H-14 vision tower (reference src/inference.py:127).

    transformers CLIP checkouts carry the vision architecture nested
    under ``vision_config`` in config.json; plain vision-model exports
    put it at top level — both are accepted."""
    from ladi_vton_tpu.models.clip import CLIPVisionConfig

    raw = _dir_config(model_dir, "")
    if raw is not None:
        raw = raw.get("vision_config", raw)
        cfg = CLIPVisionConfig(**_config_kwargs(CLIPVisionConfig, raw))
    else:
        cfg = vit_h_vision_config()
    model = CLIPVisionModel(cfg, dtype=dtype, param_dtype=param_dtype)
    variables = _cached_convert(
        _find_model_file(model_dir, ""), "clip_vit_h",
        lambda: C.convert_clip_vision(_load_model_dir_state(model_dir, "")))
    return model, _to_jax(variables, param_dtype)
