"""Multi-process DP smoke test: two CPU processes initialize the JAX
distributed runtime, shard data disjointly, run a sharded jit step over a
global 2-device mesh, and all-reduce MeanIoU counters — the TPU-native
equivalent of the reference's DDP + DistributedSampler + metric
all_reduce (train.py:33-53, dataset/sampler.py, metric_util.py:69-73).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
# jax may be preloaded at interpreter startup (site customization), so
# JAX_PLATFORMS must come from the environment; pin via config too.
jax.config.update("jax_platforms", "cpu")

from gaussianformer_tpu.parallel.distributed import (
    init_distributed, all_reduce_sum_host)
from gaussianformer_tpu.data.loader import ShardedSampler
from gaussianformer_tpu.metrics.mean_iou import MeanIoU

proc_id, num_procs = init_distributed()
assert num_procs == 2, num_procs
assert len(jax.devices()) == 2

# --- sampler shards are disjoint and cover the dataset
sampler = ShardedSampler(10, shard_id=proc_id, num_shards=num_procs,
                         shuffle=True, seed=0)
idxs = sorted(sampler)

# --- sharded jit step over the global mesh: per-process batch halves,
# global mean must see both (implicit psum through sharded autodiff)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), ("data", "model"))
local = jnp.full((1, 4), float(proc_id + 1))
gbatch = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data"))
@jax.jit
def global_mean(x):
    return jnp.mean(x)
gm = float(jax.device_get(global_mean(gbatch)))
assert abs(gm - 1.5) < 1e-6, gm

# --- metric counter all-reduce
miou = MeanIoU(class_indices=[1, 2], empty_label=3,
               label_str=["a", "b"])
# each process sees a different half of a tiny prediction
if proc_id == 0:
    out = jnp.asarray([1, 1, 2, 3]); tgt = jnp.asarray([1, 2, 2, 3])
else:
    out = jnp.asarray([2, 1, 3, 3]); tgt = jnp.asarray([2, 1, 1, 3])
miou.update(out, tgt, jnp.ones((4,), bool))
m, occ, per = miou.result(distributed=True)

print(json.dumps({"proc": proc_id, "idxs": idxs, "miou": m, "occ": occ,
                  "per": list(map(float, per))}))
"""


@pytest.mark.timeout(240)
def test_two_process_dp_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "COORDINATOR_ADDRESS": f"localhost:{port}",
           "NUM_PROCESSES": "2",
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            env={**env, "PROCESS_ID": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        import json
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["proc"]] = rec

    # disjoint shards covering all 10 indices
    all_idx = sorted(results[0]["idxs"] + results[1]["idxs"])
    assert all_idx == list(range(10))

    # both processes agree on the reduced metric, and it matches the
    # single-process computation over the concatenated data
    assert results[0]["miou"] == results[1]["miou"]
    from gaussianformer_tpu.metrics.mean_iou import MeanIoU
    import jax.numpy as jnp
    ref = MeanIoU(class_indices=[1, 2], empty_label=3, label_str=["a", "b"])
    ref.update(jnp.asarray([1, 1, 2, 3, 2, 1, 3, 3]),
               jnp.asarray([1, 2, 2, 3, 2, 1, 1, 3]),
               jnp.ones((8,), bool))
    m, occ, _ = ref.result()
    assert abs(results[0]["miou"] - m) < 1e-9
    assert abs(results[0]["occ"] - occ) < 1e-9
