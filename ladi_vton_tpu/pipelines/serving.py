"""Production serving wrapper around the try-on pipeline.

The reference is batch-script-only; this framework targets serving too
(BASELINE.json north star).  ``TryOnService`` owns the compiled
split-program sampler, accepts variable-size requests, pads them to the
fixed compiled batch (XLA needs static shapes), and strips the padding
on return.  One instance per process; thread-safe via a simple lock
(JAX dispatch is internally threadsafe, the lock just keeps request
batches coherent).
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladi_vton_tpu.pipelines.tryon import TryOnPipeline


class TryOnService:
    def __init__(
        self,
        pipe: TryOnPipeline,
        params,
        *,
        batch_size: int = 8,
        height: int = 512,
        width: int = 384,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        context_dim: int = 1024,
        seed: int = 0,
    ):
        self.pipe = pipe
        self.params = params
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.context_dim = context_dim
        self._rng = jax.random.key(seed)
        self._count = 0
        self._lock = threading.Lock()
        self._sampler = pipe.jit_sample(
            split=True, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale)

    def warmup(self):
        """Compile the programs ahead of the first request."""
        z = np.zeros((self.batch_size, self.height, self.width, 3),
                     np.float32)
        self.generate(
            image=z,
            inpaint_mask=np.ones(
                (self.batch_size, self.height, self.width, 1), np.float32),
            pose_map=np.zeros(
                (self.batch_size, self.height, self.width, 18), np.float32),
            warped_cloth=z,
            prompt_embeds=np.zeros(
                (self.batch_size, 77, self.context_dim), np.float32),
            negative_prompt_embeds=np.zeros(
                (self.batch_size, 77, self.context_dim), np.float32),
        )

    def _pad(self, x: np.ndarray) -> jax.Array:
        n = x.shape[0]
        if n < self.batch_size:
            reps = [x] + [x[-1:]] * (self.batch_size - n)
            x = np.concatenate(reps)
        elif n > self.batch_size:
            raise ValueError(
                f"request batch {n} exceeds compiled batch "
                f"{self.batch_size}; split the request")
        return jnp.asarray(x)

    def generate(self, *, image, inpaint_mask, pose_map, warped_cloth,
                 prompt_embeds, negative_prompt_embeds,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """Run one request (<= compiled batch). Returns float32 NHWC
        images in [0, 1], unpadded."""
        n = image.shape[0]
        with self._lock:
            if rng is None:
                rng = jax.random.fold_in(self._rng, self._count)
                self._count += 1
            out = self._sampler(
                self.params,
                self._pad(image), self._pad(inpaint_mask),
                self._pad(pose_map), self._pad(warped_cloth),
                self._pad(prompt_embeds), self._pad(negative_prompt_embeds),
                rng)
        return np.asarray(out)[:n]
