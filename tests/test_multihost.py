"""Multi-HOST smoke (SURVEY.md §4 item 3 'multi-host logic additionally
testable with jax.distributed multi-process on localhost'): two real
processes, one CPU device each, full sharded train step over the 2-process
mesh — collectives actually cross a process boundary (TCP), unlike the
8-fake-device tests."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax

coord, pid = sys.argv[1], int(sys.argv[2])
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2  # one cpu device per process

import jax.numpy as jnp
from recmodels_tpu.data import SyntheticSource, criteo_schema
from recmodels_tpu.models import build_model
from recmodels_tpu.parallel import (build_parallel_engine, build_parallel_steps,
                                    make_mesh, shard_state)
from recmodels_tpu.parallel.multihost import host_shard

sch = criteo_schema(vocab_size=400, embed_dim=8)
mesh = make_mesh()  # both devices, both processes
eng = build_parallel_engine(build_model("fm", sch), mesh, emb_lr=5e-2, capacity_factor=4.0)
state = shard_state(eng.init(jax.random.key(0)), mesh)
train, _ = build_parallel_steps(eng, mesh)

# global batch assembled per-host: each process feeds its own shard via
# jax.make_array_from_process_local_data
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np

h_idx, h_cnt = host_shard()
src = SyntheticSource(sch, batch_size=32, seed=0, shard_index=h_idx, shard_count=h_cnt)
it = iter(src)
sharding = NamedSharding(mesh, P("data"))
losses = []
for i in range(3):
    b = next(it)
    args = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(x))
        for x in (b.dense, b.ids, b.labels)
    )
    state, m = train(state, *args)
    losses.append(float(m["loss"]))
print("WORKER_OK", pid, [round(l, 4) for l in losses])
"""


@pytest.mark.slow
def test_two_process_sharded_training():
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    # drop the fake-device flag inherited from conftest: each process should
    # contribute exactly one real CPU device to the global mesh
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, f"worker {i} failed:\n{out[-3000:]}"
    # both processes computed the same (psum'd) loss sequence
    l0 = [l for l in outs[0].splitlines() if "WORKER_OK" in l][0].split("[")[1]
    l1 = [l for l in outs[1].splitlines() if "WORKER_OK" in l][0].split("[")[1]
    assert l0 == l1
