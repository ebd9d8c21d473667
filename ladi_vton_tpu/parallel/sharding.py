"""Data-parallel execution over the device mesh.

The reference's only distribution strategy is DDP through HF accelerate
(SURVEY.md §2.5; reference src/train_vto.py:434-442, src/inference.py:
223) — here the equivalent is batch sharding over the ``data`` axis of a
``jax.sharding.Mesh``:

* training: ``train.steps.shard_step`` jits the step with sharded batch
  / replicated params; the gradient mean lowers to a ``psum`` over ICI.
* inference: ``data_parallel_sampler`` wraps the try-on sampler so each
  chip denoises its shard of the batch; outputs gather back for saving
  (the reference's per-rank loop + per-process save).

DP is the primary axis (LaDI-VTON's work is batch-dominated); the
``model`` mesh axis carries the Megatron-style tensor-parallel layout
in ``parallel.tp`` for the latency/memory cases DP cannot split.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh  # re-export


def eval_shard_batch(mesh, tree):
    """Device-put a numpy batch with the leading axis sharded on data."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def eval_placement(mesh) -> tuple[Callable, Callable]:
    """(put_replicated, put_sharded) helpers for batch inference.

    "Computation follows data": put the weight trees replicated and the
    batch arrays sharded over ``data``, and every jitted program
    downstream (prep / denoise scan / decode) executes data-parallel
    across the mesh with XLA inserting any needed collectives — the
    TPU equivalent of the reference's accelerator.prepare(dataloader)
    DDP eval sharding (reference src/inference.py:223).

    When the mesh carries a ``model`` axis > 1 (``--tensor_parallel`` on
    the CLIs), a weight tree with a top-level ``"unet"`` key gets the
    Megatron column/row plan from ``parallel.tp`` on that sub-tree
    instead of replication — the placement is the whole mechanism:
    every jitted sampler downstream is placement-driven, so GSPMD
    shards the attention/FF matmuls over ``model`` and inserts the
    per-block all-reduces.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    tp = dict(mesh.shape).get("model", 1)

    def put_replicated(tree):
        if tp > 1 and isinstance(tree, dict) and "unet" in tree:
            from ladi_vton_tpu.parallel.tp import tp_shardings

            return {
                k: (jax.device_put(v, tp_shardings(v, mesh))
                    if k == "unet" else jax.device_put(v, repl))
                for k, v in tree.items()
            }
        return jax.device_put(tree, repl)

    def put_sharded(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), tree)

    return put_replicated, put_sharded


def data_parallel_sampler(sample_fn: Callable, mesh) -> Callable:
    """jit a pipeline sampler with batch-sharded image inputs.

    ``sample_fn(params, image, mask_image, pose_map, warped_cloth,
    prompt_embeds, negative_prompt_embeds, rng)`` -> images.
    Batch size must be divisible by the ``data`` axis size (pad via
    ``data.loader.BatchLoader(pad_last=True)``).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        sample_fn,
        in_shardings=(repl,) + (data,) * 6 + (repl,),
        out_shardings=data,
    )
