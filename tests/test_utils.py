"""Tokenizer + checkpoint manager tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladi_vton_tpu.utils.tokenizer import CLIPTokenizer


@pytest.fixture(scope="module")
def tiny_tokenizer(tmp_path_factory):
    """A miniature BPE vocab good enough to exercise the machinery."""
    root = tmp_path_factory.mktemp("tok")
    # byte-level symbols + a couple of merges; '$' must land at id 259
    from ladi_vton_tpu.utils.tokenizer import _bytes_to_unicode

    symbols = list(_bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)  # 0..255
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)  # 256..511
    # '$' byte symbol is '$'; its </w> id:
    vocab["to</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    with open(root / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(root / "merges.txt", "w") as f:
        f.write("#version\n")
        f.write("t o</w>\n")
    return CLIPTokenizer.from_dir(root)


def test_tokenizer_shapes_and_special_tokens(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok(["to", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == 49406  # bos
    assert ids[0, 2] == 49407  # eos right after the merged token
    assert ids[1, 1] == 49407  # empty prompt: eos immediately
    # padding is eos
    assert np.all(ids[:, -1] == 49407)


def test_tokenizer_dollar_encodes_to_end_of_word_entry(tiny_tokenizer):
    """'$' must encode to the single '$</w>' vocab entry — in the real
    CLIP vocab that entry is id 259, the PTE splice anchor
    (reference encode_text_word_embedding.py:12)."""
    tok = tiny_tokenizer
    assert tok.encode("$") == [tok.encoder["$</w>"]]
    # repeated '$' tokens each encode independently (the prompt template
    # uses ' $ ' * 16)
    assert tok.encode(" $  $ ") == [tok.encoder["$</w>"]] * 2


def test_tokenizer_merge_applies(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok.encode("to")
    assert ids == [tok.encoder["to</w>"]]


def test_checkpoint_manager_save_restore_gc(tmp_path):
    from ladi_vton_tpu.core.checkpoint import CheckpointManager
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = TrainState.create(params, make_optimizer(1e-3))
    mgr = CheckpointManager(tmp_path / "ckpts", keep=2)

    for step in (10, 20, 30):
        state = state.replace(step=jnp.asarray(step))
        mgr.save(step, state)
    # keep-last-2 GC dropped checkpoint-10
    assert mgr.latest_step() == 30
    steps = [s for s, _ in mgr._step_dirs()]
    assert steps == [20, 30]

    restored = mgr.restore(state)
    assert int(restored.step) == 30
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))

    with pytest.raises(FileNotFoundError):
        CheckpointManager(tmp_path / "empty").restore(state)


def test_async_checkpoint_manager_overlap_safe(tmp_path):
    """async_save: saves return before the write completes, mutation of
    the live state after save() cannot corrupt the snapshot (orbax
    copies to host inside save), keep-N GC still holds, and restore
    waits for the in-flight write."""
    from ladi_vton_tpu.core.checkpoint import CheckpointManager
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer

    state = TrainState.create({"w": jnp.ones((64, 64))},
                              make_optimizer(1e-3))
    mgr = CheckpointManager(tmp_path / "ck", keep=2, async_save=True)

    for step in (1, 2, 3):
        snap = state.replace(step=jnp.asarray(step),
                             params={"w": jnp.full((64, 64), float(step))})
        mgr.save(step, snap)
        # mutate the live tree right after save returns — must not
        # affect what landed on disk
        snap = snap.replace(params={"w": jnp.full((64, 64), -1.0)})
    restored = mgr.restore(state, 3)  # waits for the in-flight write
    assert int(restored.step) == 3
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.0)
    mgr.wait()
    assert [s for s, _ in mgr._step_dirs()] == [2, 3]  # keep-2 GC

    # restore_replacing also serializes against an in-flight save
    mgr.save(4, restored.replace(step=jnp.asarray(4)))
    again = mgr.restore_replacing(restored, 4)
    assert int(again.step) == 4


def test_export_torch_state_layouts(tmp_path):
    from ladi_vton_tpu.core.checkpoint import export_torch_state

    variables = {"params": {
        "conv_in": {"kernel": np.ones((3, 3, 4, 8), np.float32),
                    "bias": np.zeros(8, np.float32)},
        "norm1": {"scale": np.ones(8, np.float32),
                  "bias": np.zeros(8, np.float32)},
        "dense_0": {"kernel": np.ones((8, 16), np.float32)},
    }}
    state = export_torch_state(variables, tmp_path / "x.pth")
    assert state["conv_in.weight"].shape == (8, 4, 3, 3)
    assert state["norm1.weight"].shape == (8,)
    assert state["dense.0.weight"].shape == (16, 8)


def test_train_loop_runs_and_checkpoints(tmp_path):
    """runner.train_loop: step counting, logging cadence, checkpoint GC."""
    import jax
    import logging

    from ladi_vton_tpu.core.checkpoint import CheckpointManager
    from ladi_vton_tpu.train.runner import LoopConfig, Trackers, train_loop
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer

    params = {"w": jnp.ones((2, 2))}
    state = TrainState.create(params, make_optimizer(1e-2))

    def step_fn(state, frozen, batch, rng):
        loss = jnp.sum(state.params["w"] * batch["x"].mean())
        grads = jax.grad(
            lambda p: jnp.sum(p["w"] * batch["x"].mean()))(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    batches = [{"x": jnp.ones((2,)) * i} for i in range(4)]

    def forever():
        while True:
            yield from batches

    mgr = CheckpointManager(tmp_path / "ck", keep=2)
    trackers = Trackers(None, "test", str(tmp_path), {})
    state, final = train_loop(
        state=state, frozen={}, loader=forever(),
        jitted_step=jax.jit(step_fn),
        shard_batch=lambda b: b, ckpt_manager=mgr,
        loop=LoopConfig(max_train_steps=7, checkpointing_steps=3,
                        log_every=2),
        logger=logging.getLogger("t"), trackers=trackers)
    assert final == 7
    assert int(state.step) == 7
    assert mgr.latest_step() == 7  # final save


def test_restore_replacing_and_explicit_step_checks(tmp_path):
    from ladi_vton_tpu.core.checkpoint import CheckpointManager
    from ladi_vton_tpu.train.steps import TrainState, make_optimizer

    state = TrainState.create({"w": jnp.ones((4,))}, make_optimizer(1e-3))
    mgr = CheckpointManager(tmp_path / "ck", keep=2)
    with pytest.raises(FileNotFoundError):
        mgr.restore_replacing(state, "latest")
    with pytest.raises(FileNotFoundError):
        mgr.restore_replacing(state, 123)
    # state untouched by the failed restore attempts
    np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)

    mgr.save(5, state.replace(step=jnp.asarray(5)))
    restored = mgr.restore_replacing(state, "latest")
    assert int(restored.step) == 5


def test_checkpoint_validation_guard_raises_on_real_bugs():
    """A seeded validation bug must FAIL the run (VERDICT r2 item 5).

    Only expected missing artifacts (FileNotFoundError: metric weights,
    cache dirs) are tolerated; the reference crashes loudly on real
    validation errors (train_emasc.py:430-473 has no guard at all).
    """
    import logging

    from ladi_vton_tpu.train.runner import run_checkpoint_validation

    log = logging.getLogger("test-guard")

    # expected absence: swallowed with a log line
    def missing_weights():
        raise FileNotFoundError("inception weights not found")

    run_checkpoint_validation(missing_weights, 10, log)  # no raise

    # seeded bug (e.g. a typo'd attribute in the validation path): raises
    def buggy_validation():
        raise AttributeError("'NoneType' object has no attribute 'apply'")

    with pytest.raises(AttributeError):
        run_checkpoint_validation(buggy_validation, 10, log)

    with pytest.raises(ZeroDivisionError):
        run_checkpoint_validation(lambda: 1 / 0, 10, log)
