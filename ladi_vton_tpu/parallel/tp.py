"""Tensor-parallel (Megatron-style) sharding for the extended UNet.

The reference's only distribution strategy is DDP (SURVEY.md §2.5;
reference src/train_vto.py:434-442) and DP remains the primary scaling
axis here — at LaDI-VTON's batch-dominated workloads a v5e-8 saturates
on data parallelism alone.  This module adds the ``model`` mesh axis as
a real, tested layout for the two cases DP cannot help with:

* **latency** — a single try-on request (batch 1-8) cannot be split
  over chips by batch; sharding the transformer blocks' attention heads
  and feed-forward width splits the dominant matmuls instead;
* **memory** — the 0.87B-param UNet replicated per chip is fine on v5e
  (16 GB HBM) but TP halves/quarters the weight footprint for smaller
  parts or larger variants.

Layout (classic column/row-parallel pairs, arXiv 1909.08053):

* attention ``to_q/to_k/to_v`` kernels: column-parallel
  ``P(None, "model")`` — each chip computes its own slice of the heads;
  the attention itself is then embarrassingly head-parallel.
* attention ``to_out`` kernel: row-parallel ``P("model", None)`` — the
  partial outputs all-reduce once per attention (XLA inserts the
  ``psum`` from sharding propagation).
* GEGLU ``proj_geglu`` kernel column-parallel, FF ``proj_out``
  row-parallel: one all-reduce per feed-forward.
* Everything else (convs, GroupNorms, time embedding, transformer
  proj_in/proj_out) replicated: conv TP needs halo exchanges for a
  minority of the FLOPs — not worth the collectives at 64x48 latents.

Two honesty notes, measured/architectural:

* The fused GEGLU kernel layout ``(C, 2*inner)`` (value half ‖ gate
  half — kept for reference-checkpoint compatibility, hub/convert.py)
  pairs column ``j`` with column ``inner+j`` in the gating multiply,
  which lands on another chip under contiguous sharding; GSPMD inserts
  the reshard so results are exact, at some extra comm.  A production
  TP deployment would store value/gate as two tensors to make gating
  shard-local.
* SD-2's head counts per level are (5, 10, 20, 20) — gcd 5 — so a
  power-of-two ``model`` axis is not head-aligned at level 0; GSPMD
  reshards (correct, slower at that level).  The *inner* widths
  (320/640/1280) are what placement requires to divide ``tp``.

On the Pallas kernels: under GSPMD auto-partitioning the flash
attention / fused-GEGLU custom calls are opaque — left alone, XLA
all-gathers the head-sharded q/k/v and runs the kernel replicated.
Since heads are independent, ``tp_attention_mesh`` routes the dispatch
through a per-shard ``jax.shard_map`` instead (head axis over
``model``, batch over ``data``, zero collectives inside the attention;
``ops.attention.TP_SHARD_MESH``).  The wiring is validated numerically
on the 8-device CPU mesh (where the per-shard body routes to XLA —
same dispatch, same specs); its perf on real multi-chip hardware stays
unmeasured here (one physical chip).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@contextlib.contextmanager
def tp_attention_mesh(mesh: Mesh):
    """Route flash attention through per-shard ``shard_map`` on ``mesh``.

    Sets ``ops.attention.TP_SHARD_MESH`` for the dynamic extent (a
    compile-time routing knob: it matters while the sampler/step is
    TRACED, not while it runs).  Under GSPMD the Pallas flash custom
    call is opaque — without this, a TP-sharded UNet all-gathers the
    head-sharded q/k/v to run the kernel replicated; with it, each chip
    runs the kernel on its own heads (heads are independent; zero
    collectives inside the attention).  Head counts that don't divide
    the ``model`` axis fall back to GSPMD per call site (SD-2 level 0
    has 5 heads — module docstring).
    """
    from ladi_vton_tpu.ops import attention

    prev = attention.TP_SHARD_MESH
    attention.TP_SHARD_MESH = mesh
    try:
        yield
    finally:
        attention.TP_SHARD_MESH = prev


def tp_attention_scope(mesh: Mesh, tensor_parallel: int):
    """Entered ``ExitStack`` routing flash attention per-shard while it
    is open — a no-op stack when ``tensor_parallel <= 1``.

    CLI mains hold one of these for their tracing extent and ``close()``
    it on the way out: an in-process ``main()`` drive (tests, notebooks)
    must not leak the process-global routing knob into later work
    (advisor r4 — the knob previously was assigned directly and never
    reset).
    """
    stack = contextlib.ExitStack()
    if tensor_parallel > 1:
        stack.enter_context(tp_attention_mesh(mesh))
    return stack


def _tp_leaf_spec(path_keys: tuple[str, ...]) -> P:
    """PartitionSpec for one UNet param leaf, by its flax path."""
    leaf = path_keys[-1]
    in_ff = "ff" in path_keys
    if any(k in ("to_q", "to_k", "to_v") for k in path_keys):
        return P(None, "model") if leaf == "kernel" else P("model")
    if "to_out" in path_keys:
        return P("model", None) if leaf == "kernel" else P()
    if in_ff and "proj_geglu" in path_keys:
        return P(None, "model") if leaf == "kernel" else P("model")
    if in_ff and "proj_out" in path_keys:
        return P("model", None) if leaf == "kernel" else P()
    return P()


def unet_tp_specs(params) -> Any:
    """PartitionSpec pytree over UNet params (Megatron column/row plan).

    Works on the full flax variables dict (``{'params': {...}}``) or the
    inner params tree; non-transformer leaves come back ``P()``.
    """

    def spec(path, leaf):
        del leaf
        keys = tuple(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey))
        return _tp_leaf_spec(keys)

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_shardings(params, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` on ``mesh``; raises with the
    offending path if a sharded axis does not divide the ``model`` axis
    size (placement would fail opaquely downstream otherwise)."""
    tp = mesh.shape["model"]
    specs = unet_tp_specs(params)

    def check(path, leaf, spec):
        for ax, name in enumerate(spec):
            if name == "model" and leaf.shape[ax] % tp != 0:
                pretty = "/".join(
                    p.key for p in path
                    if isinstance(p, jax.tree_util.DictKey))
                raise ValueError(
                    f"TP axis size {tp} does not divide {pretty} axis "
                    f"{ax} (shape {leaf.shape}); pick tp dividing the "
                    f"attention inner widths")
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(check, params, specs)


def tp_place(params, mesh: Mesh):
    """device_put UNet params with the TP plan (everything else P())."""
    return jax.device_put(params, tp_shardings(params, mesh))


def _dict_names(path) -> tuple[str, ...]:
    return tuple(p.key for p in path
                 if isinstance(p, jax.tree_util.DictKey))


def tp_train_state(state, mesh: Mesh, *, unet_key: str = "unet"):
    """Place a TrainState for 2D (data x model) training: the UNet
    params TP-sharded, other trainables replicated, and the Adam
    moments sharded LIKE their parameters — the TP analogue of what
    ``zero1_state_sharding`` does over ``data``.

    The moment shardings must be assigned explicitly (``out_shardings``
    on a jitted ``tx.init``): ``zeros_like`` has no data dependence on
    the parameter values, so XLA's sharding propagation alone would
    leave freshly-initialized moments unsharded.  Each optimizer-state
    leaf is matched to its parameter by dict-path suffix (optax state
    trees embed the exact params tree under ``mu``/``nu``); unmatched
    leaves (step counts) replicate.
    """
    repl = NamedSharding(mesh, P())
    placed = {}
    for key, sub in state.params.items():
        placed[key] = (jax.device_put(sub, tp_shardings(sub, mesh))
                       if key == unet_key else jax.device_put(sub, repl))

    param_map = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(placed)[0]:
        param_map[_dict_names(path)] = (leaf.sharding, leaf.shape)
    suffix_lens = sorted({len(k) for k in param_map}, reverse=True)

    def moment_sharding(path, leaf):
        names = _dict_names(path)
        for plen in suffix_lens:
            hit = param_map.get(names[-plen:]) if len(names) >= plen \
                else None
            if hit is not None and hit[1] == leaf.shape:
                return hit[0]
        return repl

    opt_shapes = jax.eval_shape(state.tx.init, placed)
    opt_sharding = jax.tree_util.tree_map_with_path(moment_sharding,
                                                    opt_shapes)
    opt_state = jax.jit(state.tx.init,
                        out_shardings=opt_sharding)(placed)
    return state.replace(step=jax.device_put(state.step, repl),
                         params=placed, opt_state=opt_state)


def tp_jit_step(step_fn: Callable, mesh: Mesh) -> tuple[Callable, Callable]:
    """jit a ``step(state, frozen, batch, rng)`` for a 2D mesh.

    Unlike ``train.steps.shard_step`` (explicit replicated-params
    in_shardings), placement drives sharding here: put the state with
    ``tp_train_state``, the frozen towers replicated, the batch
    data-sharded — jit respects committed argument placements and GSPMD
    inserts the grad ``psum`` over ``data`` plus the per-block
    all-reduces over ``model``.
    """
    data = NamedSharding(mesh, P("data"))

    def shard_batch_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), tree)

    return jax.jit(step_fn, donate_argnums=(0,)), shard_batch_tree


def tensor_parallel_sampler(sample_fn: Callable, mesh: Mesh,
                            params) -> tuple[Callable, Any]:
    """(jitted sampler, placed params) for 2D-mesh batch inference.

    ``sample_fn(params, image, mask_image, pose_map, warped_cloth,
    prompt_embeds, negative_prompt_embeds, rng) -> images`` with
    ``params = {'unet': ..., ...}``: the UNet shards over ``model``,
    other towers replicate, the batch shards over ``data`` — the
    TP-extended form of ``sharding.data_parallel_sampler``.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    placed = {
        key: (jax.device_put(sub, tp_shardings(sub, mesh))
              if key == "unet" else jax.device_put(sub, repl))
        for key, sub in params.items()
    }
    jitted = jax.jit(
        sample_fn,
        in_shardings=(None,) + (data,) * 6 + (repl,),
        out_shardings=data,
    )
    return jitted, placed
