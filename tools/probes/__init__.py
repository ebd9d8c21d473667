"""TPU performance probes — one harness, one subcommand per probe.

Run via ``python tools/perf.py <probe>`` (or ``python -m
tools.probes.<module>``).  Every probe times REAL shapes of the
LaDI-VTON towers on the live TPU with chained-iteration timing (the
axon relay has a ~3 ms dispatch floor and slow host transfers, so
naive per-call timing lies — see docs/PERF.md for the methodology and
the measured numbers these probes produced).

The measured crossover tables that route kernels in the model code
(ops/group_norm.py, ops/geglu.py, models/layers.py Upsample2D,
ops/attention.py) are recorded durably in docs/PERF.md.
"""

PROBES = {
    "unet-ablations": ("tools.probes.unet_ablations",
                       "UNet forward ablations + pipeline stage times"),
    "unet-components": ("tools.probes.unet_components",
                        "per-component breakdown of the UNet step"),
    "attention-tuning": ("tools.probes.attention_tuning",
                         "flash-attention block-size tuning at S=3072"),
    "chained-components": ("tools.probes.chained_components",
                           "floor-free chained component timings"),
    "transformer-internals": ("tools.probes.transformer_internals",
                              "level-0 transformer sub-part timings"),
    "vae-decode": ("tools.probes.vae_decode",
                   "VAE decode breakdown at 512x384"),
    "upsample-phase": ("tools.probes.upsample_phase",
                       "nearest-up2+conv3x3: naive vs 4-phase fused"),
    "attention-bakeoff": ("tools.probes.attention_bakeoff",
                          "our flash kernel vs jax builtin vs XLA"),
    "attention-layout": ("tools.probes.attention_layout",
                         "head-major bhsd layout vs BSHD transposes"),
    "geglu": ("tools.probes.geglu", "fused pallas GEGLU vs XLA"),
    "unet-routing-ab": ("tools.probes.unet_routing_ab",
                        "whole-UNet A/B of kernel routing choices"),
    "stage-breakdown": ("tools.probes.stage_breakdown",
                        "prep/decode stage internals at 512x384"),
    "attention-dots": ("tools.probes.attention_dots",
                       "isolate slow transformer projection dots"),
    "unet-trace": ("tools.probes.unet_trace",
                   "device-trace op-bucket attribution of the UNet step"),
    "kv-hoist-ab": ("tools.probes.kv_hoist_ab",
                    "denoise-scan A/B of cross-attn context-KV hoisting"),
    "condition-bench": ("tools.probes.condition_bench",
                        "conditioning-stage cost (TPS/refine/ViT-H/PTE)"),
    "driver-pipeline": ("tools.probes.driver_pipeline",
                        "serial vs pipelined batch-stream driver loop"),
    "int8-dots": ("tools.probes.int8_dots",
                  "int8 W8A8 dots vs bf16 at UNet matmul shapes"),
    "latency": ("tools.probes.latency",
                "single-request (B=1/2/4) serving latency, ddim50 + dpm20"),
}
