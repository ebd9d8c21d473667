"""Execute the multi-PROCESS path for real (VERDICT r3 item 6).

Everything else in the suite is single-process multi-device; the
reference's equivalent (accelerate DDP spawn, reference
src/train_vto.py:204-206) is inherently multi-process.  This test
launches TWO OS processes that each call
``core.distributed.initialize`` against a localhost coordinator, build
one global mesh over both processes' CPU devices, run a sharded train
step whose gradient psum crosses the process boundary, gate a
checkpoint write on ``is_main_process``, and ``gather_to_host`` an
eval array across processes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

RANK_SCRIPT = r"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from ladi_vton_tpu.core import distributed

rank = int(sys.argv[1])
coord = sys.argv[2]
out_dir = sys.argv[3]

distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank

from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devices = np.asarray(jax.devices()).reshape(-1)  # 4 global (2 per proc)
mesh = Mesh(devices, ("data",))
shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

# deterministic global batch; every process holds its own slice
B, D = 8, 16
rng = np.random.default_rng(0)
x_global = rng.standard_normal((B, D)).astype(np.float32)
y_global = rng.standard_normal((B, 1)).astype(np.float32)
x = multihost_utils.host_local_array_to_global_array(
    x_global[rank * B // 2:(rank + 1) * B // 2], mesh, P("data"))
y = multihost_utils.host_local_array_to_global_array(
    y_global[rank * B // 2:(rank + 1) * B // 2], mesh, P("data"))

w = jax.device_put(np.zeros((D, 1), np.float32), repl)
opt = optax.sgd(0.1)
opt_state = jax.device_put(opt.init(w), repl)


def loss_fn(w, x, y):
    return jnp.mean((x @ w - y) ** 2)


@jax.jit
def step(w, opt_state, x, y):
    # grad of a mean over the data-sharded batch: XLA inserts the
    # cross-process psum over the 2x2-device mesh
    loss, g = jax.value_and_grad(loss_fn)(w, x, y)
    updates, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(w, updates), opt_state, loss


w2, opt_state, loss = step(w, opt_state, x, y)
loss = float(loss)

# oracle: the same step single-process on the full batch
loss_ref = float(np.mean((x_global @ np.zeros((D, 1), np.float32)
                          - y_global) ** 2))
w_ref = 0.0 - 0.1 * (2.0 / B) * x_global.T @ (
    x_global @ np.zeros((D, 1), np.float32) - y_global)

# process-0-gated side effect (the accelerator.is_main_process pattern)
if distributed.is_main_process():
    with open(os.path.join(out_dir, "ckpt_marker.txt"), "w") as f:
        f.write("rank0")

# eval-time cross-process gather
local_eval = np.full((2,), float(rank), np.float32)
gathered = np.asarray(distributed.gather_to_host(local_eval))

result = {
    "rank": rank,
    "process_count": jax.process_count(),
    "n_global_devices": len(jax.devices()),
    "n_local_devices": len(jax.local_devices()),
    "loss": loss,
    "loss_ref": loss_ref,
    "w_max_err": float(np.abs(np.asarray(w2.addressable_data(0))
                              - w_ref).max()),
    "gathered": gathered.reshape(-1).tolist(),
    "is_main": distributed.is_main_process(),
}
with open(os.path.join(out_dir, f"result_{rank}.json"), "w") as f:
    json.dump(result, f)
print(json.dumps(result), flush=True)
"""


RANK_SCRIPT_CKPT = r"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from ladi_vton_tpu.core import distributed

rank = int(sys.argv[1])
coord = sys.argv[2]
out_dir = sys.argv[3]
async_save = bool(int(sys.argv[4]))

distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=rank)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ladi_vton_tpu.core.checkpoint import CheckpointManager
from ladi_vton_tpu.train.steps import TrainState

devices = np.asarray(jax.devices()).reshape(-1)  # 4 global (2 per proc)
mesh = Mesh(devices, ("data",))
shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

# a TrainState whose params (and therefore Adam moments) are GENUINELY
# sharded across the two processes: each rank holds/writes only its own
# shards of w (8,16) over the 4-device data axis
w0 = (np.arange(8 * 16, dtype=np.float32).reshape(8, 16) / 128.0)
tx = optax.adam(1e-2)


def place(state):
    # matrices shard over the global data axis, scalars replicate — every
    # leaf must be committed to the GLOBAL mesh (a process-local scalar
    # would make the jitted step's device set inconsistent)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard if getattr(x, "ndim", 0) == 2
                                 else repl), state)


state = place(TrainState.create({"w": w0}, tx))
x = jax.device_put(np.linspace(-1.0, 1.0, 16).astype(np.float32), repl)


def loss_fn(params, x):
    return jnp.sum((params["w"] @ x) ** 2)


@jax.jit
def step(state, x):
    return state.apply_gradients(jax.grad(loss_fn)(state.params, x))


state1 = step(state, x)
ckpt = CheckpointManager(out_dir, keep=2, async_save=async_save)
ckpt.save(1, state1)          # collective orbax write, every rank
state2 = step(state1, x)      # uninterrupted trajectory continues
ckpt.wait()

# restore into fresh sharded memory in BOTH processes, resume the step
fresh = place(TrainState.create({"w": w0}, tx))
restored = ckpt.restore_replacing(fresh, "latest")
resumed = step(restored, x)

mu = lambda s: s.opt_state[0].mu["w"]  # first Adam moment, sharded too
result = {
    "rank": rank,
    "restored_step": int(restored.step),
    "sharding_kept": restored.params["w"].sharding.is_equivalent_to(
        shard, 2),
    "w_err": float(jnp.max(jnp.abs(
        resumed.params["w"] - state2.params["w"]))),
    "mu_err": float(jnp.max(jnp.abs(mu(resumed) - mu(state2)))),
    "ckpt_dirs": sorted(p for p in os.listdir(out_dir)
                        if p.startswith("checkpoint-")),
}
with open(os.path.join(out_dir, f"ckpt_result_{rank}.json"), "w") as f:
    json.dump(result, f)
print(json.dumps(result), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    script = tmp_path / "rank.py"
    script.write_text(RANK_SCRIPT)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append((out, err))

    results = {}
    for rank in (0, 1):
        path = tmp_path / f"result_{rank}.json"
        assert path.exists(), outs
        results[rank] = json.loads(path.read_text())

    for rank, r in results.items():
        assert r["process_count"] == 2
        assert r["n_global_devices"] == 4  # 2 procs x 2 local devices
        assert r["n_local_devices"] == 2
        # sharded loss == full-batch oracle (the psum crossed processes)
        np.testing.assert_allclose(r["loss"], r["loss_ref"], rtol=1e-5)
        assert r["w_max_err"] < 1e-5
        # gather_to_host returned BOTH processes' eval shards, in rank
        # order, on every process
        assert r["gathered"] == [0.0, 0.0, 1.0, 1.0]
    assert results[0]["is_main"] and not results[1]["is_main"]
    # the checkpoint marker was written exactly once, by rank 0
    assert (tmp_path / "ckpt_marker.txt").read_text() == "rank0"


@pytest.mark.parametrize("async_save", [0, 1], ids=["sync", "async"])
def test_two_process_sharded_orbax_checkpoint(tmp_path, async_save):
    """Cross-process-sharded TrainState through orbax (VERDICT r4 item
    4): two processes collectively save a data-sharded params+Adam
    state (each rank writing only its shards), restore in both, and a
    post-restore step matches the uninterrupted trajectory bit-exactly.
    The classic TPU-pod failure mode — rank-local shards torn from the
    collective commit — would surface here as a restore error or a
    trajectory divergence.  Reference equivalent: accelerate
    save_state/load_state (src/train_vto.py:493,670)."""
    script = tmp_path / "rank_ckpt.py"
    script.write_text(RANK_SCRIPT_CKPT)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), coord,
             str(tmp_path), str(async_save)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append((out, err))

    for rank in (0, 1):
        path = tmp_path / f"ckpt_result_{rank}.json"
        assert path.exists(), outs
        r = json.loads(path.read_text())
        assert r["restored_step"] == 1
        assert r["sharding_kept"], "restore must land on the 2-process mesh"
        assert r["w_err"] == 0.0, r  # CPU determinism: bit-exact resume
        assert r["mu_err"] == 0.0, r
        assert r["ckpt_dirs"] == ["checkpoint-1"]
