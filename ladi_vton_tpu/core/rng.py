"""Seeding & PRNG-stream utilities.

The reference seeds python/numpy/torch/cuda globally
(reference: src/utils/set_seeds.py:8-18) and threads a single CUDA
generator through sampling (src/inference.py:226).  JAX PRNG is explicit
and splittable; this module provides the equivalent single entry point
plus named stream derivation so every stochastic site (latent noise,
timestep draw, cond dropout, dropout layers) gets an independent,
reproducible stream.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


def stream(root: jax.Array, name: str, step: int = 0) -> jax.Array:
    """Derive a named, step-indexed key from the root key."""
    folded = jax.random.fold_in(root, hash(name) % (2**31))
    return jax.random.fold_in(folded, step)
