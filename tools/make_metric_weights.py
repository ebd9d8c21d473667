"""Synthesize metric-network checkpoints (random init) in the torch
layouts `metrics.compute` loads — pytorch-fid InceptionV3 and
lpips-package AlexNet — so the FID/KID/IS/SSIM/LPIPS path is drivable
end-to-end without downloads.  Real weights drop into the same files.

Writes  <out>/inception.pth  and  <out>/lpips_alex.pth
(default out: /tmp/weights/metrics; point LADI_VTON_METRIC_WEIGHTS at it).

Importable: ``make_metric_weights(out_dir)`` (used by
tests/test_torch_oracles.py to drive the in-image torch parity oracles).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
from pathlib import Path


def _pin_cpu(jax) -> None:
    """Re-pin jax_platforms=cpu at the config level (the axon
    jax-import hook force-sets "axon,cpu", which would block backend
    init on the TPU relay); no-op if backends already initialized
    (e.g. called from the CPU-pinned test suite)."""
    from jax._src import xla_bridge as _xb

    if not _xb.backends_are_initialized():
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def make_inception_weights(out: Path, seed: int = 0) -> Path:
    """Random-init InceptionV3 in the pytorch-fid checkpoint layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    _pin_cpu(jax)

    from ladi_vton_tpu.metrics.inception import InceptionV3

    model = InceptionV3(fid_variant=True)
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((1, 299, 299, 3)))
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    state = {}

    def walk(tree, stat_tree, path):
        if isinstance(tree, dict) and "conv" in tree and "bn" in tree:
            mod = ".".join(path)
            k = np.asarray(tree["conv"]["kernel"])  # HWIO
            state[mod + ".conv.weight"] = torch.from_numpy(
                np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
            bn = tree["bn"]
            sbn = (stat_tree.get("bn", {})
                   if isinstance(stat_tree, dict) else {})
            state[mod + ".bn.weight"] = torch.from_numpy(
                np.asarray(bn["scale"]))
            state[mod + ".bn.bias"] = torch.from_numpy(
                np.asarray(bn["bias"]))
            state[mod + ".bn.running_mean"] = torch.from_numpy(
                np.asarray(sbn.get("mean", np.zeros_like(bn["bias"]))))
            state[mod + ".bn.running_var"] = torch.from_numpy(
                np.asarray(sbn.get("var", np.ones_like(bn["bias"]))))
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, stat_tree.get(k, {})
                     if isinstance(stat_tree, dict) else {}, path + [k])

    walk(params, stats, [])
    if "fc" in params:
        state["fc.weight"] = torch.from_numpy(
            np.asarray(params["fc"]["kernel"]).T.copy())
        state["fc.bias"] = torch.from_numpy(
            np.asarray(params["fc"]["bias"]))
    path = out / "inception.pth"
    torch.save(state, path)
    return path


def make_lpips_weights(out: Path, seed: int = 0) -> Path:
    """Random-init LPIPS-Alex in the lpips-package checkpoint layout."""
    import numpy as np
    import torch

    g = np.random.default_rng(seed)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    tv_idx = (0, 3, 6, 8, 10)
    lp = {}
    for (o, i, kh, kw), ti in zip(shapes, tv_idx):
        lp[f"net.features.{ti}.weight"] = torch.from_numpy(
            (g.standard_normal((o, i, kh, kw)) * 0.02).astype(np.float32))
        lp[f"net.features.{ti}.bias"] = torch.from_numpy(
            np.zeros((o,), np.float32))
    for i, c in enumerate((64, 192, 384, 256, 256)):
        lp[f"lins.{i}.model.1.weight"] = torch.from_numpy(
            np.abs(g.standard_normal((1, c, 1, 1))).astype(
                np.float32) * 0.1)
    path = out / "lpips_alex.pth"
    torch.save(lp, path)
    return path


def make_metric_weights(out_dir, seed: int = 0) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    inc = make_inception_weights(out, seed)
    lp = make_lpips_weights(out, seed)
    print(f"wrote {inc} and {lp}")
    return out


if __name__ == "__main__":
    make_metric_weights(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/weights/metrics")
