"""ladi_vton_tpu — a TPU-native LaDI-VTON virtual try-on framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
miccunifi/ladi-vton (LaDI-VTON, ACM MM 2023, arXiv 2305.13501):

* latent-diffusion virtual try-on pipeline (``pipelines.tryon``)
* EMASC-aware VAE with encoder feature taps / decoder injection
  (``models.vae``)
* extended 31-channel SD-2-inpainting UNet (``models.unet_condition``)
* textual-inversion adapter producing pseudo-word token embeddings
  (``models.inversion_adapter``, ``diffusion.text``)
* thin-plate-spline garment warping + refinement (``models.tps``,
  ``models.refinement``)
* DressCode / VITON-HD data layer with jit-able preprocessing (``data``)
* data-parallel training/inference over a ``jax.sharding.Mesh``
  (``parallel``)
* Pallas TPU kernels for the hot paths (``ops``)

Everything is NHWC, bfloat16-compute-friendly, and designed around
XLA's compilation model: static shapes, ``lax.scan`` loops, sharded
``jit`` steps.
"""

__version__ = "0.1.0"
