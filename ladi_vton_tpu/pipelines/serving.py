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
        mesh=None,
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
        # with a mesh, padded request batches shard over its ``data``
        # axis so non-model-axis devices split the work instead of
        # computing replicated copies (advisor r4; matches
        # inference/eval's eval_placement batch sharding)
        self._data_sharding = None
        if mesh is not None and dict(mesh.shape).get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = dict(mesh.shape)["data"]
            if batch_size % n_data:
                raise ValueError(
                    f"serving batch_size {batch_size} must be a "
                    f"multiple of the data-axis size {n_data}")
            self._data_sharding = NamedSharding(mesh, P("data"))
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
        if self._data_sharding is not None:
            return jax.device_put(np.asarray(x), self._data_sharding)
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


_REQUEST_KEYS = ("image", "inpaint_mask", "pose_map", "warped_cloth",
                 "prompt_embeds", "negative_prompt_embeds")


class MicroBatcher:
    """Dynamic micro-batching front-end for :class:`TryOnService`.

    Individual requests (each a dict of the six sampler arrays with a
    leading sample axis) are submitted from any number of client
    threads; a single dispatcher thread coalesces queued requests up to
    the service's compiled ``batch_size`` — waiting at most
    ``max_delay_ms`` after the first sample arrives — and runs ONE
    padded device batch for the whole group.  Per-request results come
    back through futures.  This converts low-concurrency request
    streams into full compiled batches (the per-chip MFU sweet spot is
    batch 8 — docs/PERF.md §7) without recompiling per request size.

    Requests are never split across device batches: a request that
    does not fit in the remaining capacity of the current group starts
    the next group, so each future resolves from exactly one sampler
    call.
    """

    def __init__(self, service, *, max_delay_ms: float = 25.0):
        import queue

        self.service = service
        self.max_delay = max_delay_ms / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # observability: batch fill rate = samples_done / (batches_done
        # * batch_size); surfaced by /healthz
        self.requests_done = 0
        self.samples_done = 0
        self.batches_done = 0
        self.errors = 0
        self._dispatcher = threading.Thread(target=self._loop, daemon=True)
        self._dispatcher.start()

    def submit(self, request: dict):
        """Queue one request; returns a ``concurrent.futures.Future``
        resolving to that request's float32 [0,1] NHWC images."""
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        missing = [k for k in _REQUEST_KEYS if k not in request]
        if missing:
            raise ValueError(f"request missing arrays: {missing}")
        n = request["image"].shape[0]
        if not 1 <= n <= self.service.batch_size:
            raise ValueError(
                f"request size {n} outside [1, {self.service.batch_size}]")
        fut = Future()
        self._queue.put((request, n, fut))
        return fut

    def close(self):
        """Drain outstanding requests and stop the dispatcher."""
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._dispatcher.join()

    def _collect_group(self):
        """Block for the first request, then coalesce until the batch
        is full, the delay budget lapses, or the next request would
        overflow (it is pushed back for the next group)."""
        import queue
        import time

        first = self._queue.get()
        if first is None:
            return None
        group, total = [first], first[1]
        deadline = time.monotonic() + self.max_delay
        while total < self.service.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-raise the stop sentinel
                break
            if total + item[1] > self.service.batch_size:
                self._queue.put(item)  # start the next group with it
                break
            group.append(item)
            total += item[1]
        return group

    def _loop(self):
        while True:
            group = self._collect_group()
            if group is None:
                return
            arrays = {
                k: np.concatenate([np.asarray(req[k]) for req, _, _ in group])
                for k in _REQUEST_KEYS
            }
            try:
                out = self.service.generate(**arrays)
            except Exception as e:  # resolve every waiter, don't die
                self.errors += 1
                for _, _, fut in group:
                    fut.set_exception(e)
                continue
            off = 0
            for _, n, fut in group:
                fut.set_result(out[off:off + n])
                off += n
            self.batches_done += 1
            self.requests_done += len(group)
            self.samples_done += off


class ConditionService:
    """Pads/strips wrapper around the jitted conditioning program
    (``pipelines.condition.build_condition_fn``): in-shop cloth +
    pose/mask + category strings → warped cloth and prompt embeddings,
    ready for the try-on sampler."""

    def __init__(self, condition_fn, cond_params, tokenizer, *,
                 batch_size: int = 8, num_vstar: int = 16):
        from ladi_vton_tpu.data.labels import CATEGORY_PROMPT_TEXT

        self.condition_fn = condition_fn
        self.cond_params = cond_params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.num_vstar = num_vstar
        self._prompt_text = CATEGORY_PROMPT_TEXT
        self._lock = threading.Lock()

    def _pad(self, x: np.ndarray) -> jax.Array:
        n = x.shape[0]
        if n < self.batch_size:
            x = np.concatenate([x] + [x[-1:]] * (self.batch_size - n))
        elif n > self.batch_size:
            raise ValueError(
                f"request batch {n} exceeds compiled batch "
                f"{self.batch_size}; split the request")
        return jnp.asarray(x)

    def run(self, *, cloth, pose_map, im_mask, categories):
        """categories: sequence of n strings (dresses/upper_body/
        lower_body).  Returns (warped_cloth, prompt_embeds,
        negative_prompt_embeds) stripped back to n samples."""
        n = cloth.shape[0]
        prompts = [
            f'a photo of a model wearing {self._prompt_text[str(c)]} '
            f'{" $ " * self.num_vstar}'
            for c in categories
        ]
        input_ids = np.asarray(self.tokenizer(prompts))
        with self._lock:
            warped, ehs, neg = self.condition_fn(
                self.cond_params, self._pad(pose_map), self._pad(cloth),
                self._pad(im_mask), self._pad(input_ids))
        return (np.asarray(warped)[:n], np.asarray(ehs)[:n],
                np.asarray(neg)[:n])


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only): POST /tryon with an .npz of the six
# sampler arrays -> .npz {"images": float32 [0,1] NHWC}; POST /condition
# (when a ConditionService is mounted) with an .npz of cloth, pose_map,
# im_mask, category -> .npz of warped_cloth + prompt embeddings;
# GET /healthz.  /tryon requests from concurrent clients coalesce
# through the MicroBatcher into full compiled device batches.

def make_http_server(batcher: "MicroBatcher", host: str = "127.0.0.1",
                     port: int = 8080, *, request_timeout_s: float = 600.0,
                     condition_service: Optional[ConditionService] = None):
    """Build (don't start) a ``ThreadingHTTPServer`` over ``batcher``.

    Call ``.serve_forever()`` (blocking) or drive it from a thread;
    ``.server_address`` carries the bound (host, port) — pass
    ``port=0`` for an ephemeral port.
    """
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: stderr spam per request
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            svc = batcher.service
            self._json(200, {
                "status": "ok",
                "batch_size": getattr(svc, "batch_size", None),
                "height": getattr(svc, "height", None),
                "width": getattr(svc, "width", None),
                "queue_depth": batcher._queue.qsize(),
                "condition": condition_service is not None,
                "requests_done": batcher.requests_done,
                "samples_done": batcher.samples_done,
                "batches_done": batcher.batches_done,
                "errors": batcher.errors,
            })

        def _read_npz(self):
            n = int(self.headers.get("Content-Length", "0"))
            payload = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
            return {k: payload[k] for k in payload.files}

        def _npz_reply(self, **arrays):
            buf = io.BytesIO()
            np.savez_compressed(buf, **arrays)
            self._reply(200, buf.getvalue(), "application/octet-stream")

        def do_POST(self):
            if self.path == "/tryon":
                return self._tryon()
            if self.path == "/condition" and condition_service is not None:
                return self._condition()
            return self._json(404, {"error": "unknown path"})

        def _tryon(self):
            try:
                request = self._read_npz()
            except Exception as e:
                return self._json(400, {"error": f"bad npz payload: {e}"})
            try:
                fut = batcher.submit(request)
            except (ValueError, RuntimeError) as e:
                return self._json(400, {"error": str(e)})
            try:
                images = fut.result(timeout=request_timeout_s)
            except Exception as e:
                return self._json(500, {"error": str(e)})
            self._npz_reply(images=images)

        def _condition(self):
            try:
                request = self._read_npz()
                cloth = request["cloth"]
                pose_map = request["pose_map"]
                im_mask = request["im_mask"]
                categories = [str(c) for c in request["category"]]
            except Exception as e:
                return self._json(400, {"error": f"bad npz payload: {e}"})
            try:
                warped, ehs, neg = condition_service.run(
                    cloth=cloth, pose_map=pose_map, im_mask=im_mask,
                    categories=categories)
            except (KeyError, ValueError) as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            self._npz_reply(warped_cloth=warped, prompt_embeds=ehs,
                            negative_prompt_embeds=neg)

    return ThreadingHTTPServer((host, port), Handler)
