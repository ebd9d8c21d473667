"""Checkpoint / resume / export.

The reference has two mechanisms (SURVEY.md §5.4): accelerate full-state
dirs ``checkpoint-{step}`` with keep-last-2 GC and ``latest`` resolution
(reference: src/train_vto.py:481-500,661-709), plus raw ``.pth``
state-dict exports that hubconf downloads (src/train_vto.py:711-720,
hubconf.py:25-62).  Equivalents here:

* ``CheckpointManager`` — orbax-backed full train-state checkpoints,
  atomic writes (orbax's tmp+rename), keep-last-N GC, ``latest``/step
  resume — preemption-safe, which matters on TPU pools.
* ``export_torch_state`` — converts flax params back to a torch ``.pth``
  with reference-compatible key names (the exact inverse of
  ``hub.convert``), so models trained here deploy against the
  reference's loaders and vice versa.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    """Orbax checkpointing with reference-style ``checkpoint-{step}``
    naming and keep-last-N garbage collection.

    ``async_save=True`` overlaps the checkpoint write with training:
    ``save`` returns once the arrays are snapshotted to host memory
    (device buffers free to be donated into the next step) and the
    serialization runs on a background thread — a full train state is
    ~10 GB and a blocking write stalls every chip for its duration.
    Atomicity is unchanged (orbax tmp+rename: ``_step_dirs`` never sees
    a partial checkpoint), saves serialize against each other, and
    ``restore``/GC wait for any in-flight write first.  Call ``wait()``
    (or just let the next ``save`` do it) before reading the directory
    externally.
    """

    def __init__(self, directory: str | Path, *, keep: int = 2,
                 async_save: bool = False):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self.async_save = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()

    def _step_dirs(self) -> list[tuple[int, Path]]:
        out = []
        for p in self.directory.iterdir():
            m = re.fullmatch(r"checkpoint-(\d+)", p.name)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def _gc(self):
        """keep-last-N GC (reference train_vto.py:701-709).  Runs only
        on process 0: under multi-process training every rank calls
        ``save`` (orbax writes are collective) but a concurrent rmtree
        from several ranks could tear a directory orbax is finalizing."""
        if jax.process_index() != 0:
            return
        dirs = self._step_dirs()
        for _, old in dirs[: max(0, len(dirs) - self.keep)]:
            import shutil

            try:
                shutil.rmtree(old)
            except OSError as e:  # GC must never kill training
                print(f"checkpoint GC failed for {old}: {e}")

    def save(self, step: int, state: Any):
        path = self.directory / f"checkpoint-{step}"
        if self.async_save:
            import orbax.checkpoint as ocp

            # serialize with the previous in-flight write; GC only dirs
            # that are already durable (never counting the about-to-be
            # written one): a crash mid-write must still leave ``keep``
            # completed checkpoints on disk (advisor r4).  The one-extra
            # dir this retains is collected by the next save/wait.
            self._ckptr.wait_until_finished()
            self._gc()
            self._ckptr.save(path, args=ocp.args.StandardSave(state))
            return
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        self._gc()

    def wait(self):
        """Block until any in-flight async save is durably on disk,
        then apply the deferred keep-N GC."""
        self._ckptr.wait_until_finished()
        if self.async_save:
            self._gc()

    def restore(self, state_like: Any, step: int | str = "latest") -> Any:
        self._ckptr.wait_until_finished()
        if step == "latest":
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
        path = self.directory / f"checkpoint-{step}"
        if self.async_save:
            import orbax.checkpoint as ocp

            # AsyncCheckpointer routes kwargs through the args API
            return self._ckptr.restore(
                path, args=ocp.args.StandardRestore(state_like))
        return self._ckptr.restore(path, target=state_like)

    def restore_replacing(self, state: Any,
                          step: int | str = "latest") -> Any:
        """Restore INTO the memory of ``state``: frees the live device
        buffers first, then restores against an abstract target — a full
        train state is ~10GB and a naive restore would hold two copies
        (HBM-exhausting on a 16GB chip)."""
        self._ckptr.wait_until_finished()
        if step == "latest":
            if self.latest_step() is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
        elif not (self.directory / f"checkpoint-{step}").exists():
            raise FileNotFoundError(
                f"no checkpoint-{step} under {self.directory}")
        import jax

        # Carry each array's sharding into the abstract target: orbax
        # then restores every leaf directly onto its mesh placement
        # (ZeRO-1 sharded optimizer states land shard-wise, no
        # replicated staging copy and no "sharding info not provided"
        # fallback-to-file warning).
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding)
            if isinstance(x, jax.Array) else x, state)
        jax.tree_util.tree_map(
            lambda x: x.delete() if isinstance(x, jax.Array) else None,
            state)
        return self.restore(abstract, step)


# --------------------------------------------------------- torch export


def _flatten(tree: dict, prefix=()) -> dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _to_torch_key_value(path: tuple, arr: np.ndarray):
    """Invert hub.convert naming: flax path -> torch key + layout."""
    parts = []
    for p in path[:-1]:
        # resnets_0 -> resnets.0 ; layers_3 -> layers.3 ; conv_0_2 -> conv.0.2
        parts.extend(re.sub(r"_(\d+)", r".\1", p).split("."))
    leaf = path[-1]
    key = ".".join(parts)
    dot = key + "." if key else ""
    if leaf == "kernel":
        if arr.ndim == 4:  # conv HWIO -> OIHW
            return dot + "weight", np.transpose(arr, (3, 2, 0, 1))
        return dot + "weight", arr.T  # dense
    if leaf == "scale":
        return dot + "weight", arr
    if leaf == "embedding":
        return dot + "weight", arr
    if leaf in ("bias", "mean", "var"):
        suffix = {"bias": "bias", "mean": "running_mean",
                  "var": "running_var"}[leaf]
        return dot + suffix, arr
    return dot + leaf, arr


def export_torch_state(variables: dict, path: "str | Path | None",
                       key_map=None) -> dict:
    """Write flax variables as a torch-compatible ``.pth`` state dict.

    ``key_map``: optional callable str->str to rename keys into a
    specific reference module layout (e.g. EMASC conv.N.{0,2}).
    ``path=None`` skips the file write and just returns the state dict
    (for callers bundling several states into one ``.pth``).
    """
    import torch

    state = {}
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    for path_t, arr in {**_flatten(params), **_flatten(stats)}.items():
        key, value = _to_torch_key_value(path_t, arr)
        if key_map:
            key = key_map(key)
        state[key] = torch.from_numpy(np.ascontiguousarray(value))
    if path is not None:
        torch.save(state, str(path))
    return state


def emasc_torch_key_map(key: str) -> str:
    """flax ``conv.i.j.*`` (from conv_{i}_{j}) -> reference
    ``conv.i.j.*`` already matches; kept for documentation symmetry."""
    return key


def unet_torch_key_map(key: str) -> str:
    """Map exported flax UNet keys to diffusers' module layout so the
    ``unet_{step}.pth`` this framework writes loads into the reference's
    UNet2DConditionModel (hubconf.py:30-37) and back through
    ``hub.convert.convert_unet``:

    * attention output proj: ``to_out.weight`` -> ``to_out.0.weight``
      (diffusers wraps it in a Sequential with dropout)
    * GEGLU feed-forward: ``ff.proj_geglu`` -> ``ff.net.0.proj``,
      ``ff.proj_out`` -> ``ff.net.2``
    """
    key = re.sub(r"\.to_out\.(weight|bias)$", r".to_out.0.\1", key)
    key = re.sub(r"\.ff\.proj_geglu\.", ".ff.net.0.proj.", key)
    key = re.sub(r"\.ff\.proj_out\.", ".ff.net.2.", key)
    # time_embedding keeps literal underscores in diffusers
    key = key.replace("time_embedding.linear.1.", "time_embedding.linear_1.")
    key = key.replace("time_embedding.linear.2.", "time_embedding.linear_2.")
    return key


def clip_vision_torch_key_map(key: str) -> str:
    """Exported flax CLIP vision keys -> transformers CLIPVisionModel."""
    key = re.sub(r"^class_embedding",
                 "vision_model.embeddings.class_embedding", key)
    key = re.sub(r"^patch_embedding\.",
                 "vision_model.embeddings.patch_embedding.", key)
    key = re.sub(r"^position_embedding\.",
                 "vision_model.embeddings.position_embedding.", key)
    key = re.sub(r"^pre_layrnorm\.", "vision_model.pre_layrnorm.", key)
    key = re.sub(r"^layers\.(\d+)\.",
                 r"vision_model.encoder.layers.\1.", key)
    key = key.replace(".mlp_fc1.", ".mlp.fc1.")
    key = key.replace(".mlp_fc2.", ".mlp.fc2.")
    return key


def inversion_adapter_torch_key_map(key: str) -> str:
    """Exported adapter keys -> reference InversionAdapter layout
    (inversion_adapter.py: encoder_layers.N, post_layernorm, layers.N)."""
    key = key.replace(".mlp_fc1.", ".mlp.fc1.")
    key = key.replace(".mlp_fc2.", ".mlp.fc2.")
    return key


def tps_torch_key_map(key: str) -> str:
    """Exported ConvNetTPS keys -> reference ConvNet_TPS Sequential
    indices (ConvNet_TPS.py:29-55,90-123)."""
    ext_convs = {0: 0, 1: 3, 2: 6, 3: 9, 4: 12, 5: 15}
    ext_bns = {0: 2, 1: 5, 2: 8, 3: 11, 4: 14}
    reg_convs = {0: 0, 1: 3, 2: 6, 3: 9}
    reg_bns = {0: 1, 1: 4, 2: 7, 3: 10}
    m = re.match(r"(extraction[AB])\.conv\.(\d+)\.(.*)", key)
    if m:
        return f"{m.group(1)}.model.{ext_convs[int(m.group(2))]}.{m.group(3)}"
    m = re.match(r"(extraction[AB])\.bn\.(\d+)\.(.*)", key)
    if m:
        return f"{m.group(1)}.model.{ext_bns[int(m.group(2))]}.{m.group(3)}"
    m = re.match(r"regression\.conv\.(\d+)\.(.*)", key)
    if m:
        return (f"loc_net.regression.conv."
                f"{reg_convs[int(m.group(1))]}.{m.group(2)}")
    m = re.match(r"regression\.bn\.(\d+)\.(.*)", key)
    if m:
        return (f"loc_net.regression.conv."
                f"{reg_bns[int(m.group(1))]}.{m.group(2)}")
    if key.startswith("regression.linear"):
        return key.replace("regression.linear", "loc_net.regression.linear")
    return key


def refinement_torch_key_map(key: str) -> str:
    """Exported UNetVanilla keys -> reference unet_parts Sequential
    layout (double_conv indices 0/1/3/4; down maxpool_conv.1; up conv)."""
    conv_idx = {0: 0, 1: 3}
    bn_idx = {0: 1, 1: 4}
    m = re.match(r"(inc|down\d|up\d)\.(conv|bn)\.(\d)\.(.*)", key)
    if m:
        mod, kind, i, rest = m.groups()
        idx = (conv_idx if kind == "conv" else bn_idx)[int(i)]
        if mod == "inc":
            prefix = "inc.double_conv"
        elif mod.startswith("down"):
            prefix = f"{mod}.maxpool_conv.1.double_conv"
        else:
            prefix = f"{mod}.conv.double_conv"
        return f"{prefix}.{idx}.{rest}"
    if key.startswith("outc."):
        return key.replace("outc.", "outc.conv.")
    return key


def clip_text_torch_key_map(key: str) -> str:
    """Exported flax CLIP text keys -> transformers CLIPTextModel keys
    (embeddings/encoder prefixes + mlp_fcN -> mlp.fcN)."""
    key = re.sub(r"^token_embedding\.", "text_model.embeddings."
                 "token_embedding.", key)
    key = re.sub(r"^position_embedding\.", "text_model.embeddings."
                 "position_embedding.", key)
    key = re.sub(r"^layers\.(\d+)\.", r"text_model.encoder.layers.\1.", key)
    key = re.sub(r"^final_layer_norm\.", "text_model.final_layer_norm.",
                 key)
    key = key.replace(".mlp_fc1.", ".mlp.fc1.")
    key = key.replace(".mlp_fc2.", ".mlp.fc2.")
    return key
