"""Multi-host initialization & cross-host utilities.

The reference delegates multi-node setup to HF accelerate/torchrun
(LOCAL_RANK plumbing, reference src/train_vto.py:204-206).  The
TPU-native equivalent (SURVEY.md §5.8): ``jax.distributed.initialize``
on every host of the pod slice, process-0-only side effects, and
``multihost_utils`` for cross-host gathers at eval time.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX when running on more than one host.

    No-ops for single-process runs (the common single-slice case where
    the TPU runtime handles discovery itself).  Arguments fall back to
    the standard env vars (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) used by TPU pod launchers.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return  # single host; jax auto-initializes
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes
                          or os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("PROCESS_ID", 0)),
    )


def is_main_process() -> bool:
    """Checkpoint/metric writes happen on process 0 only (the
    accelerator.is_main_process equivalent)."""
    return jax.process_index() == 0


def gather_to_host(x):
    """All-gather a per-host array to every host (eval-time gather,
    the accelerator.gather equivalent at reference train_vto.py:637)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
