"""Perf probe: device-trace attribution of a jitted program.

Captures a jax.profiler trace and buckets TensorCore op durations
(fusions / convolutions / pallas kernels / layout copies / reduces /
other) so optimization targets are measured, not guessed.  Target
selected by env var ``TRACE_TARGET``: ``unet`` (default, CFG-16 UNet
forward), ``encode`` (the prep stage's 2B VAE encoder pass) or
``decode`` (B=8 EMASC decode).  Round-2 UNet numbers (pre-bhsd,
78.8 ms step): other fusions 31.4 | pallas 22.8 | conv 10.8 | copies
6.8 | LN reduces 3.2 (docs/PERF.md §6).

Run: [TRACE_TARGET=decode] python tools/perf.py unet-trace
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, DT = 16, jnp.bfloat16
STEPS = 10


def bucket(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "flash" in n or "pallas" in n or "tpu_custom" in n:
        return "pallas"
    if n.startswith("copy") or "transpose" in n and "fusion" not in n:
        return "copy"
    if "convolution" in n or n.startswith("conv"):
        return "conv"
    if n.startswith("reduce") or "norm" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    if "dot" in n or "dosort" in n:
        return "dot"
    return "other"


def build_target(target: str):
    """Returns (jitted fn, args) for the requested trace target."""
    rng = jax.random.key(0)
    if target == "unet":
        from ladi_vton_tpu.models.unet_condition import (
            UNet2DCondition,
            sd2_unet_config,
        )

        unet = UNet2DCondition(sd2_unet_config(31), dtype=DT)
        sample = jnp.zeros((B, 64, 48, 31), DT)
        t = jnp.full((B,), 981, jnp.int32)
        ctx = jnp.zeros((B, 77, 1024), DT)
        params = jax.jit(unet.init)(rng, sample[:1], t[:1], ctx[:1])

        @jax.jit
        def fwd(params, sample, t, ctx):
            return jnp.sum(unet.apply(params, sample, t, ctx).astype(
                jnp.float32))

        return fwd, (params, sample, t, ctx)

    from ladi_vton_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3), DT))
    if target == "encode":
        x = jnp.zeros((16, 512, 384, 3), DT)

        @jax.jit
        def fwd(params, x):
            moments, feats = vae.apply(params, x, method="encode")
            return (jnp.sum(moments.astype(jnp.float32))
                    + sum(jnp.sum(f.astype(jnp.float32)) for f in feats))

        return fwd, (params, x)
    if target == "decode":
        z = jnp.zeros((8, 64, 48, 4), DT)
        inter = [jnp.zeros((8, 512, 384, 128), DT),
                 jnp.zeros((8, 512, 384, 256), DT),
                 jnp.zeros((8, 256, 192, 512), DT),
                 jnp.zeros((8, 128, 96, 512), DT),
                 jnp.zeros((8, 64, 48, 512), DT)]

        @jax.jit
        def fwd(params, z, inter):
            return jnp.sum(vae.apply(
                params, z, inter, (1, 2, 3, 4, 5),
                method="decode").astype(jnp.float32))

        return fwd, (params, z, inter)
    raise SystemExit(f"unknown TRACE_TARGET {target!r}")


def main():
    print("devices:", jax.devices(), flush=True)
    target = os.environ.get("TRACE_TARGET", "unet")
    print("target:", target, flush=True)
    fwd, fargs = build_target(target)

    np.asarray(fwd(*fargs))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fwd(*fargs)
    np.asarray(out)
    wall = (time.perf_counter() - t0) / STEPS
    print(f"step wall: {wall*1e3:.2f} ms", flush=True)

    log_dir = f"/tmp/trace_{target}"
    jax.profiler.start_trace(log_dir)
    for _ in range(STEPS):
        out = fwd(*fargs)
    np.asarray(out)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(
        f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace under {log_dir}"
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # keep only TensorCore-lane complete events (device compute); the
    # trace also carries host threads and async DMA lanes
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    core_pids = {pid for pid, n in pid_names.items()
                 if "TPU" in n or "tensorcore" in n.lower()}

    per_bucket = collections.Counter()
    per_name = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in core_pids:
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # XLA op lanes carry 'run_id'/'fusion' metadata; skip module-
        # level umbrella events to avoid double counting
        if args.get("group_id") is None and "/" not in name and \
                "fusion" not in name and "%" not in name and \
                not args:
            pass
        dur = ev.get("dur", 0) / 1e6  # us -> s
        if name.startswith("jit_") or name == "jit_fwd":
            continue
        total += dur
        per_bucket[bucket(name)] += dur
        per_name[name.split(".")[0]] += dur

    n_steps = STEPS
    print(f"\ntensorcore total {total/n_steps*1e3:.2f} ms/step "
          f"(lanes: {sorted(pid_names[p] for p in core_pids)})",
          flush=True)
    for b, d in per_bucket.most_common():
        print(f"  {b:10s} {d/n_steps*1e3:8.2f} ms/step", flush=True)
    print("\ntop ops:", flush=True)
    for name, d in per_name.most_common(25):
        print(f"  {d/n_steps*1e3:8.3f} ms  {name[:90]}", flush=True)

    # top INDIVIDUAL instructions with their HLO metadata (shape /
    # source line when present) — this is what names the actual copy
    # and reshape sites
    per_instr = collections.Counter()
    instr_meta = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in core_pids:
            continue
        name = ev.get("name", "")
        if name.startswith("jit_"):
            continue
        per_instr[name] += ev.get("dur", 0) / 1e6
        if name not in instr_meta and ev.get("args"):
            instr_meta[name] = ev["args"]
    print("\ntop instructions:", flush=True)
    for name, d in per_instr.most_common(30):
        meta = instr_meta.get(name, {})
        extra = " | ".join(
            str(meta[k])[:110] for k in ("long_name", "shape",
                                         "tf_op", "source")
            if k in meta)
        print(f"  {d/n_steps*1e3:8.3f} ms  {name[:40]}  {extra[:180]}",
              flush=True)

    # every layout copy individually — these are the relayout sites the
    # NHWC alignment work targets (VERDICT r3 item 4)
    print("\nall copy instructions:", flush=True)
    for name, d in per_instr.most_common():
        if bucket(name) != "copy":
            continue
        meta = instr_meta.get(name, {})
        extra = " | ".join(
            str(meta[k])[:150] for k in ("long_name", "tf_op") if k in meta)
        print(f"  {d/n_steps*1e3:8.3f} ms  {name[:30]}  {extra[:220]}",
              flush=True)


if __name__ == "__main__":
    main()
