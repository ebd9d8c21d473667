"""Device mesh + sharding helpers.

The reference scales with HF accelerate / torch DDP over NCCL
(reference: src/train_vto.py:222-226,434-442).  Here distribution is a
``jax.sharding.Mesh`` with named axes; data parallelism shards the batch
axis over ``data`` and XLA inserts the gradient ``psum`` automatically
when the loss is averaged under ``jit`` with sharded inputs.  A ``model``
axis is provisioned for tensor-parallel experiments even though the
reference never needed one (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. ``data * model`` must divide device count."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    spec: MeshSpec = MeshSpec(), devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of arrays with the batch axis sharded on ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
