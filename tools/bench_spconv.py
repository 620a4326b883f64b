"""Microbench: spconv formulations at flagship size (P=6400, C=128,
grid 100x100x8, k=5).

    python tools/bench_spconv.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
from gaussianformer_tpu.ops.sparse_conv import (submanifold_conv3d,
    submanifold_conv3d_dense, submanifold_conv3d_dense2d)

rng = np.random.RandomState(0)
P, C = 6400, 128
grid = (100, 100, 8)
feats = jnp.asarray(rng.randn(P, C), jnp.bfloat16)
coords = jnp.asarray(rng.randint(0, [100, 100, 8], (P, 3)), jnp.int32)
w = jnp.asarray(rng.randn(5, 5, 5, C, C) * 0.05, jnp.bfloat16)

for name, fn in [("gather", submanifold_conv3d),
                 ("dense", submanifold_conv3d_dense),
                 ("dense2d", submanifold_conv3d_dense2d)]:
    f = jax.jit(lambda x, c: fn(x, c, grid, w))
    o = f(feats, coords); jax.device_get(o[0, :2])
    g = jax.jit(jax.grad(lambda x, c: jnp.sum(f(x, c) ** 2), argnums=0))
    go = g(feats, coords); jax.device_get(go[0, :2])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n): o = f(feats, coords)
    jax.device_get(o[0, :2]); t1 = time.perf_counter()
    for _ in range(n): go = g(feats, coords)
    jax.device_get(go[0, :2]); t2 = time.perf_counter()
    print(f"{name}: fwd {(t1-t0)/n*1e3:.2f} ms  fwd+bwd {(t2-t1)/n*1e3:.2f} ms")
