"""torch.hub-style entry points for the LaDI-VTON TPU framework.

Completes the reference's public model-zoo surface
(reference: hubconf.py:16-64): the same four loadable models by the
same names, each returning a ``(flax_module, converted_variables)``
pair instead of a torch ``nn.Module``.  Works both through
``torch.hub.load('<this repo>', '<name>', source=...)`` — torch.hub
only needs this file to be importable and the entry points callable —
and as a plain import (``from hubconf import extended_unet``).

Weight resolution matches ``hub.zoo``: ``checkpoint=`` path >
``checkpoint_dir/<name>_<dataset>.pth`` > the reference's GitHub
release URL (downloaded only if the environment has network access).
"""

dependencies = ["jax", "flax", "torch", "numpy"]


def inversion_adapter(dataset: str = "vitonhd", **kwargs):
    """CLIP ViT-H/14 features -> 16 pseudo-word token embeddings in
    SD-2 text space (reference hubconf.py:16-27)."""
    from ladi_vton_tpu.hub import zoo

    return zoo.inversion_adapter(dataset, **kwargs)


def extended_unet(dataset: str = "vitonhd", **kwargs):
    """31-input-channel SD-2-inpainting UNet with trained try-on
    weights (reference hubconf.py:30-37)."""
    from ladi_vton_tpu.hub import zoo

    return zoo.extended_unet(dataset, **kwargs)


def emasc(dataset: str = "vitonhd", **kwargs):
    """Nonlinear EMASC with the reference channel plan
    (reference hubconf.py:40-53)."""
    from ladi_vton_tpu.hub import zoo

    return zoo.emasc(dataset, **kwargs)


def warping_module(dataset: str = "vitonhd", **kwargs):
    """((ConvNetTPS, vars), (UNetVanilla refinement, vars)) with
    trained warping weights (reference hubconf.py:56-64)."""
    from ladi_vton_tpu.hub import zoo

    return zoo.warping_module(dataset, **kwargs)
