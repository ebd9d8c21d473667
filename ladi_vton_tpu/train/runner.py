"""Shared training-run scaffolding for the four training CLIs.

Replaces what the reference delegates to HF accelerate (SURVEY.md §5):
process logging with per-process verbosity, tracker init
(wandb/tensorboard when importable), checkpoint-resume with step math,
and the jitted step loop over the mesh.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import numpy as np


def setup_logging(output_dir: str, name: str = "ladi_vton_tpu"):
    """Python logging like the reference's get_logger split
    (reference src/train_vto.py:228-241)."""
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO if jax.process_index() == 0 else logging.ERROR,
    )
    return logging.getLogger(name)


class Trackers:
    """wandb / tensorboard experiment tracking, import-gated
    (reference src/train_vto.py:461-466 accelerate trackers)."""

    def __init__(self, report_to: Optional[str], project: str,
                 output_dir: str, config: dict,
                 entity: Optional[str] = None):
        self.backends = []
        if jax.process_index() != 0:
            return
        if report_to in ("wandb", "all"):
            try:
                import wandb

                wandb.init(project=project, entity=entity, config=config,
                           dir=output_dir)
                self.backends.append(("wandb", wandb))
            except Exception as e:
                print(f"wandb unavailable ({e}); logging to jsonl")
        if report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.backends.append(
                    ("tb", SummaryWriter(log_dir=output_dir)))
            except Exception as e:
                print(f"tensorboard unavailable ({e})")
        # always keep a local jsonl so runs are inspectable offline
        self._jsonl = open(Path(output_dir) / "metrics.jsonl", "a")
        self.backends.append(("jsonl", self._jsonl))

    def log(self, metrics: dict, step: int):
        for kind, backend in self.backends:
            if kind == "wandb":
                backend.log(metrics, step=step)
            elif kind == "tb":
                for k, v in metrics.items():
                    backend.add_scalar(k, v, step)
            elif kind == "jsonl":
                backend.write(json.dumps({"step": step, **metrics}) + "\n")
                backend.flush()

    def log_images(self, tag: str, images, step: int, output_dir=None):
        """Image-grid logging (the reference's wandb.Image grids,
        src/train_tps.py:474-490): wandb/tb when live, PNG dump always."""
        import numpy as np

        arr = np.asarray(images)
        for kind, backend in self.backends:
            if kind == "wandb":
                backend.log({tag: [backend.Image(a) for a in arr]},
                            step=step)
            elif kind == "tb":
                backend.add_images(tag, arr.transpose(0, 3, 1, 2), step)
        if output_dir:
            from PIL import Image as PILImage

            grid_dir = Path(output_dir) / "samples"
            grid_dir.mkdir(parents=True, exist_ok=True)
            for i, a in enumerate(arr[:8]):
                PILImage.fromarray(
                    (np.clip(a, 0, 1) * 255).astype("uint8")
                ).save(grid_dir / f"{tag.replace('/', '_')}_{step}_{i}.png")

    def finish(self):
        for kind, backend in self.backends:
            if kind == "wandb":
                backend.finish()
            elif kind == "tb":
                backend.close()
            elif kind == "jsonl":
                backend.close()


def run_checkpoint_validation(fn, step: int, logger) -> None:
    """Run a checkpoint-time validation hook with the narrow guard.

    Policy (VERDICT r2 item 5): tolerate ONLY the expected missing
    artifacts — metric weights or cache dirs absent in a smoke
    environment surface as ``FileNotFoundError`` — and let every other
    exception raise, like the reference's validation does
    (reference train_emasc.py:430-473 has no try/except at all).  A
    blanket catch here would silently train all four stages blind.
    """
    try:
        fn()
    except FileNotFoundError as e:
        logger.info(
            f"validation at step {step} skipped (missing artifact): {e}")


@dataclasses.dataclass
class LoopConfig:
    max_train_steps: int
    checkpointing_steps: int = 50000
    log_every: int = 50
    seed: int = 1234


def train_loop(
    *,
    state,
    frozen,
    loader,
    jitted_step: Callable,
    shard_batch: Callable,
    ckpt_manager,
    loop: LoopConfig,
    logger,
    trackers: Trackers,
    start_step: int = 0,
    on_checkpoint: Optional[Callable] = None,
    batch_to_arrays: Optional[Callable] = None,
):
    """Generic epoch/step loop with checkpoint + resume step math
    (reference src/train_vto.py:506-738)."""
    rng = jax.random.key(loop.seed)
    step = start_step
    t_last = time.perf_counter()
    while step < loop.max_train_steps:
        for batch in loader:
            if step >= loop.max_train_steps:
                break
            arrays = batch_to_arrays(batch) if batch_to_arrays else batch
            sharded = shard_batch(arrays)
            step_rng = jax.random.fold_in(rng, step)
            state, metrics = jitted_step(state, frozen, sharded, step_rng)
            step += 1
            if step % loop.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.perf_counter()
                metrics["steps_per_sec"] = loop.log_every / (now - t_last)
                t_last = now
                logger.info(f"step {step}: {metrics}")
                trackers.log(metrics, step)
            if step % loop.checkpointing_steps == 0:
                ckpt_manager.save(step, state)
                logger.info(f"saved checkpoint-{step}")
                if on_checkpoint:
                    on_checkpoint(step, state)
    if step > start_step and step % loop.checkpointing_steps != 0:
        # final save — unless the last step already checkpointed at a
        # boundary (orbax dirs are atomic and never overwritten), or
        # nothing trained (resume at max_train_steps)
        ckpt_manager.save(step, state)
    if hasattr(ckpt_manager, "wait"):
        # async_save managers: the final checkpoint must be durable
        # before the process exits
        ckpt_manager.wait()
    return state, step
