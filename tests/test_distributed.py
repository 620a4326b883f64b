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


@pytest.mark.slow
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


TRAIN_WORKER = r"""
import os, sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
import time as _t

from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from jax._src import distributed as _dist
from gaussianformer_tpu.parallel.distributed import init_distributed
from gaussianformer_tpu.parallel.mesh import make_mesh, shard_global_batch
from gaussianformer_tpu.train.optim import build_optimizer
from gaussianformer_tpu.train.train_state import create_train_state
from gaussianformer_tpu.train.step import build_loss
from __graft_entry__ import _flagship_model_and_batch

proc_id, num_procs = init_distributed()
assert num_procs == 2


def _log(msg):
    print(f"[w{proc_id} {_t.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


# SERIALIZE all of worker 1's compiles behind worker 0's (the persistent
# cache turns them into fast loads): two concurrent full-model compiles
# thrash the single CPU core past every coordination timeout. No
# collective runs before the 'compiled' barrier — the AOT compile uses
# abstract global shapes.
sentinel = os.environ["COMPILE_SENTINEL"]
if proc_id == 1:
    for _ in range(1500):
        if os.path.exists(sentinel):
            break
        _t.sleep(1)

model, batch, cfg = _flagship_model_and_batch(small=True, batch=2)
local = {k: v[proc_id:proc_id + 1] for k, v in batch.items()}
mesh = make_mesh(num_data=2, num_model=1)
rng = jax.random.PRNGKey(0)

_log("init start")
variables = jax.jit(model.init, static_argnames=("training",))(
    {"params": rng, "dropout": rng},
    local["imgs"], local["projection_mat"], local["image_wh"],
    occ_xyz=local["occ_xyz"], occ_label=local["occ_label"],
    occ_cam_mask=local["occ_cam_mask"], training=True, rng=rng)
loss_fn = build_loss(cfg)
tx, _ = build_optimizer(variables["params"], cfg.optim.lr, 1000,
                        backbone_lr_mult=cfg.optim.backbone_lr_mult,
                        grad_max_norm=cfg.optim.grad_max_norm)
state = create_train_state(variables, tx)
_log("state ready")


def train_step(state, batch, rng):
    def compute_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["projection_mat"], batch["image_wh"],
            occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
            occ_cam_mask=batch["occ_cam_mask"], training=True, rng=rng,
            rngs={"dropout": jax.random.fold_in(rng, 1)})
        return loss_fn(out)
    (loss, logs), grads = jax.value_and_grad(
        compute_loss, has_aux=True)(state.params)
    return state.apply_gradients(grads), loss


losses = []
with mesh:
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    abs_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype,
                                       sharding=rep), state)
    abs_batch = {k: jax.ShapeDtypeStruct(
        v.shape, v.dtype, sharding=dat) for k, v in batch.items()}
    _log("compile start")
    compiled = jax.jit(train_step).lower(
        abs_state, abs_batch,
        jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()
    _log("compile done")
    if proc_id == 0:
        open(sentinel, "w").write("done")
    _dist.global_state.client.wait_at_barrier("compiled", 1_000_000)
    _log("past compiled barrier")

    # materialize the global (replicated / data-sharded) arrays — these
    # are collectives, now aligned across both workers
    gstate = multihost_utils.host_local_array_to_global_array(
        state, mesh, P())
    _log("global state built")
    for step in range(2):
        gbatch = shard_global_batch(mesh, local)
        key = multihost_utils.host_local_array_to_global_array(
            jax.random.PRNGKey(step), mesh, P())
        gstate, loss = compiled(gstate, gbatch, key)
        losses.append(float(jax.device_get(loss)))
    _log("steps done")

print(json.dumps({"proc": proc_id, "losses": losses}), flush=True)
_dist.global_state.client.wait_at_barrier("done", 1_000_000)
"""


@pytest.mark.slow
@pytest.mark.timeout(1200)
def test_two_process_trainer_feed(tmp_path):
    """Two Trainer-style DP steps across 2 processes (host-local batches
    assembled into the global array via shard_global_batch) must produce
    the same losses as the single-process 2-device run on the
    concatenated batch — the reference's DDP semantics (per-rank batches
    + implicit gradient all-reduce, train.py:185-232)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "COORDINATOR_ADDRESS": f"localhost:{port}",
           "NUM_PROCESSES": "2",
           "JAX_PLATFORMS": "cpu",
           "COMPILE_SENTINEL": str(tmp_path / "compile_done"),
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            env={**env, "PROCESS_ID": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=850)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        import json
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["proc"]] = rec
    assert results[0]["losses"] == results[1]["losses"]

    # single-process reference over the concatenated batch
    import jax
    import jax.numpy as jnp
    from gaussianformer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_global_batch)
    from gaussianformer_tpu.train.optim import build_optimizer
    from gaussianformer_tpu.train.train_state import create_train_state
    from gaussianformer_tpu.train.step import build_loss
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model_and_batch

    model, batch, cfg = _flagship_model_and_batch(small=True, batch=2)
    mesh = make_mesh(num_data=2, num_model=1,
                     devices=jax.devices()[:2])
    rng = jax.random.PRNGKey(0)
    local1 = {k: v[:1] for k, v in batch.items()}
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        local1["imgs"], local1["projection_mat"], local1["image_wh"],
        occ_xyz=local1["occ_xyz"], occ_label=local1["occ_label"],
        occ_cam_mask=local1["occ_cam_mask"], training=True, rng=rng)
    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(variables["params"], cfg.optim.lr, 1000,
                            backbone_lr_mult=cfg.optim.backbone_lr_mult,
                            grad_max_norm=cfg.optim.grad_max_norm)
    state = replicate(mesh, create_train_state(variables, tx))

    def train_step(state, batch, rng):
        def compute_loss(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["projection_mat"], batch["image_wh"],
                occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=True,
                rng=rng, rngs={"dropout": jax.random.fold_in(rng, 1)})
            return loss_fn(out)
        (loss, logs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    ref_losses = []
    with mesh:
        jitted = jax.jit(train_step)
        for step in range(2):
            gbatch = shard_global_batch(mesh, batch)
            state, loss = jitted(state, gbatch, jax.random.PRNGKey(step))
            ref_losses.append(float(jax.device_get(loss)))

    for a, b in zip(results[0]["losses"], ref_losses):
        assert abs(a - b) < 2e-4, (results[0]["losses"], ref_losses)


def test_voxel_sharded_splat_matches_unsharded():
    """The head's shard_map voxel-parallel splat (model axis, Gaussians
    replicated) must match the unsharded splat numerically — forward
    AND gradients (the transpose's psum over replicated Gaussian
    inputs) — at a non-trivial size. Pins down the `check_vma=False`
    escape hatch on that path (gaussian_head.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gaussianformer_tpu.models.head.gaussian_head import GaussianHead
    from gaussianformer_tpu.models.encoder.modules import GaussianPrediction
    from gaussianformer_tpu.ops.splat import SplatGridSpec

    H, W, D = 16, 16, 8          # 2048 voxels, divisible by model=4
    B, P = 1, 96
    grid = SplatGridSpec(H=H, W=W, D=D, pc_min=(-16.0, -16.0, -4.0),
                         grid_size=2.0, scale_multiplier=4.0, radii_min=1)
    head = GaussianHead(apply_loss_type="all", use_localaggprob=True,
                        combine_geosem=True, grid=grid,
                        splat_tile_n=256, splat_chunk_g=16)
    rng = np.random.RandomState(7)
    means = jnp.asarray(rng.uniform(-14, 14, (B, P, 3)), jnp.float32)
    means = means.at[..., 2].set(
        jnp.asarray(rng.uniform(-3, 3, (B, P)), jnp.float32))
    scales = jnp.asarray(rng.uniform(0.3, 1.5, (B, P, 3)), jnp.float32)
    rots = jnp.asarray(rng.randn(B, P, 4), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 1.0, (B, P, 1)), jnp.float32)
    sem = jnp.asarray(rng.randn(B, P, 17), jnp.float32)

    xs = (np.arange(H) + 0.5) * 2.0 - 16.0
    ys = (np.arange(W) + 0.5) * 2.0 - 16.0
    zs = (np.arange(D) + 0.5) * 2.0 - 4.0
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    occ_xyz = jnp.asarray(np.stack([gx, gy, gz], -1)[None], jnp.float32)
    kw = dict(occ_label=jnp.zeros((B, H, W, D), jnp.int32),
              occ_cam_mask=jnp.ones((B, H, W, D), bool), training=True)

    def fwd(means, sem):
        gp = GaussianPrediction(means=means, scales=scales,
                                rotations=rots, opacities=opac,
                                semantics=sem)
        out = head.apply({"params": {}}, [gp], occ_xyz=occ_xyz, **kw)
        return (out["pred_occ"][0], out["bin_logits"][0],
                out["density"][0])

    def loss(means, sem):
        p, b, d = fwd(means, sem)
        return (jnp.sum(p * p) + jnp.sum(b) * 0.5
                + jnp.sum(jnp.tanh(d)))

    ref_out = jax.jit(fwd)(means, sem)
    ref_g = jax.jit(jax.grad(loss, argnums=(0, 1)))(means, sem)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "model"))
    from jax.sharding import NamedSharding, PartitionSpec as PSpec
    rep = NamedSharding(mesh, PSpec())
    means_m, sem_m = jax.device_put(means, rep), jax.device_put(sem, rep)
    with mesh, jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        sh_out = jax.jit(fwd)(means_m, sem_m)
        sh_g = jax.jit(jax.grad(loss, argnums=(0, 1)))(means_m, sem_m)

    for a, b in zip(ref_out, sh_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(ref_g, sh_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
