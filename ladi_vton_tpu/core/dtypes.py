"""Dtype policy for TPU execution.

The reference (miccunifi/ladi-vton) relies on torch.cuda.amp / HF
accelerate mixed precision with fp16 + GradScaler
(reference: src/train_tps.py:397, src/train_vto.py:137-147).  On TPU the
idiomatic equivalent is straight bfloat16 compute with float32 parameters
and no loss scaling: bf16 has fp32's exponent range, so the GradScaler
machinery is deliberately absent here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Parameter / compute / output dtypes for a model tower.

    ``param_dtype`` is what checkpoints store, ``compute_dtype`` is what
    matmuls/convs run in on the MXU, ``output_dtype`` is what leaves a
    module boundary (None = same as compute).
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = None

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_output(self, x):
        if self.output_dtype is None:
            return x
        return jnp.asarray(x, self.output_dtype)


def default_policy(mixed_precision: str = "bf16") -> DTypePolicy:
    """Mirror of the reference ``--mixed_precision`` flag values.

    ``no`` -> fp32 everywhere; ``fp16``/``bf16`` -> bf16 compute (fp16 is
    mapped to bf16: fp16 on TPU buys nothing and costs range).
    """
    if mixed_precision in ("no", "fp32", None):
        return DTypePolicy(jnp.float32, jnp.float32)
    if mixed_precision in ("bf16", "fp16", "bfloat16", "float16"):
        return DTypePolicy(jnp.float32, jnp.bfloat16)
    raise ValueError(f"unknown mixed_precision: {mixed_precision!r}")
