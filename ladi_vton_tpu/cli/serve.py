"""Serve the try-on sampler over HTTP — the production-serving surface.

The reference ships batch scripts only (src/inference.py, src/eval.py);
this framework additionally targets online serving (BASELINE.md north
star).  Endpoints:

* ``POST /tryon`` — ``.npz`` body with ``image``, ``inpaint_mask``,
  ``pose_map``, ``warped_cloth``, ``prompt_embeds``,
  ``negative_prompt_embeds`` (each with a leading sample axis,
  ``1 <= n <= --batch_size``) → ``.npz`` ``{"images"}`` float32 [0,1]
  NHWC.  Concurrent requests coalesce through the MicroBatcher into
  full compiled device batches (deadline ``--max_delay_ms``).
* ``GET /healthz`` — JSON status with the compiled geometry and queue
  depth.

Conditioning (TPS warp + refinement + PTE text encoding) is a separate
fixed-shape stage — run it client-side or through the
``cli.inference`` condition program; this server owns the denoise
sampler, the throughput-critical stage.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=["dresscode", "vitonhd"],
                    required=True, help="which released checkpoint family")
    ap.add_argument("--checkpoint_dir", type=str, default=None,
                    help="dir with the LaDI-VTON .pth releases")
    ap.add_argument("--sd2_model_dir", type=str, required=True,
                    help="stable-diffusion-2-inpainting weights dir")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch_size", type=int, default=8,
                    help="compiled device batch (8 = measured MFU sweet "
                         "spot, docs/PERF.md §7)")
    ap.add_argument("--max_delay_ms", type=float, default=25.0,
                    help="micro-batching deadline after the first "
                         "queued sample")
    ap.add_argument("--num_inference_steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=7.5)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--mixed_precision", type=str, default="bf16",
                    choices=["no", "fp16", "bf16"])
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip the compile-ahead warmup batch")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from ladi_vton_tpu.core.dtypes import default_policy
    from ladi_vton_tpu.diffusion.schedulers import DDIMScheduler
    from ladi_vton_tpu.hub import zoo
    from ladi_vton_tpu.pipelines.serving import (
        MicroBatcher,
        TryOnService,
        make_http_server,
    )
    from ladi_vton_tpu.pipelines.tryon import TryOnPipeline

    dtype = default_policy(args.mixed_precision).compute_dtype

    unet, unet_vars = zoo.extended_unet(args.dataset,
                                        checkpoint_dir=args.checkpoint_dir,
                                        dtype=dtype)
    emasc, emasc_vars = zoo.emasc(args.dataset,
                                  checkpoint_dir=args.checkpoint_dir,
                                  dtype=dtype)
    vae, vae_vars = zoo.sd2_vae(args.sd2_model_dir, dtype=dtype)

    pipe = TryOnPipeline(unet=unet, vae=vae, emasc=emasc,
                         scheduler=DDIMScheduler())
    params = {"unet": unet_vars, "vae": vae_vars, "emasc": emasc_vars}

    service = TryOnService(
        pipe, params, batch_size=args.batch_size, height=args.height,
        width=args.width, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        context_dim=unet.config.cross_attention_dim, seed=args.seed)
    if not args.no_warmup:
        print("warming up (compiling the sampler)...", flush=True)
        service.warmup()

    batcher = MicroBatcher(service, max_delay_ms=args.max_delay_ms)
    server = make_http_server(batcher, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"serving try-on on http://{host}:{port} "
          f"(batch {args.batch_size}, {args.num_inference_steps} steps)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
