"""2-process jax.distributed CPU test: the multi-host DP path actually
communicates.

The reference has no distributed tests at all (SURVEY §4); its multi-node
story is "trust torchrun+DDP". Here two real OS processes initialize
jax.distributed over a local coordinator with gloo CPU collectives, build
the global ('data',) mesh spanning both processes, and run the SAME
data-parallel training step bin/train uses — asserting the cross-process
gradient psum yields the single-process result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
_cache = None  # cache disabled in workers: XLA:CPU AOT entries record
# machine features ("prefer-no-scatter") the loader flags as unsupported
# on re-load; under suite load a worker loading them can die (SIGILL),
# which the coordination service propagates as a shutdown-barrier kill
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
proc_id = int(sys.argv[1])
coord = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2, jax.process_count()
# establish the global gloo communicator while both processes are still
# in lockstep: gloo context init has a 30 s rendezvous, and the train-
# step compile below can skew the workers past it under CPU contention
# (the -n 4 suite harness)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("gloo-warmup")
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wesep_tpu.models.bsrnn import BSRNN
from wesep_tpu.train.losses import si_sdr_loss
from wesep_tpu.train.schedulers import exponential_decrease
from wesep_tpu.train.trainer import (
    init_train_state, make_data_parallel, make_optimizer, make_train_step,
)

model = BSRNN(spk_emb_dim=16, feature_dim=8, num_repeat=1,
              joint_training=False, use_spk_transform=False,
              spk_fuse_type="multiply", multi_fuse=False, remat=False)
rng = np.random.default_rng(0)
B, T = 4, 2048
batch = {
    "wav_mix": rng.standard_normal((B, T)).astype(np.float32) * 0.1,
    "wav_targets": rng.standard_normal((B, T)).astype(np.float32) * 0.1,
    "spk_embeds": rng.standard_normal((B, 16)).astype(np.float32),
    "spk_label": np.zeros((B,), np.int32),
}
sched = exponential_decrease(num_epochs=1, epoch_iter=4, initial_lr=1e-3,
                             final_lr=1e-4, warm_up_epoch=0)
opt = make_optimizer(sched, weight_decay=0.0, clip_grad=5.0)
step = make_train_step(model, opt, [si_sdr_loss])
state = init_train_state(model, jax.random.PRNGKey(0), batch, opt)

# single-process baseline on the full global batch (local devices only)
base_state, base_metrics = jax.jit(step)(state, batch)
base_loss = float(base_metrics["loss"])

# global 4-device mesh across both processes
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
pstep = make_data_parallel(step, mesh, donate_state=False)
sharding = NamedSharding(mesh, P("data"))

def to_global(x):
    if np.ndim(x) == 0 or x.shape[0] != B:
        return jnp.asarray(x)
    return jax.make_array_from_process_local_data(sharding, x[
        proc_id * (B // 2):(proc_id + 1) * (B // 2)
    ], x.shape)

gbatch = {k: to_global(v) for k, v in batch.items()}
new_state, metrics = pstep(state, gbatch)
loss = float(metrics["loss"])
assert np.isfinite(loss)
np.testing.assert_allclose(loss, base_loss, rtol=1e-4)
print(f"proc {proc_id} OK loss={loss}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow  # 90s 2-proc run; virtual-mesh sharding tests cover fast numerics
@pytest.mark.xdist_group("subproc")
def test_two_process_data_parallel(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
