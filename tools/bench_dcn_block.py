"""Microbench: one Pallas DCN block fwd/bwd at the two R101 DCN stage
shapes of the flagship towers (stage 3: 256ch @ 54x100, stage 4:
512ch @ 27x50).

    python tools/bench_dcn_block.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time, functools, jax, jax.numpy as jnp
from gaussianformer_tpu.ops.pallas.dcn_kernel import (
    deform_conv2d_pallas_fwd, deform_conv2d_pallas_bwd)

key = jax.random.PRNGKey(0)
for (b, h, w, c) in [(6, 54, 100, 256), (6, 27, 50, 512)]:
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    off = jax.random.normal(key, (b, h, w, 18), jnp.float32) * 2.0
    msk = jax.nn.sigmoid(jax.random.normal(key, (b, h, w, 9), jnp.float32))
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
    g = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)

    fwd = jax.jit(deform_conv2d_pallas_fwd)
    bwd = jax.jit(deform_conv2d_pallas_bwd)
    o = fwd(x, off, msk, wgt); jax.device_get(o[0, 0, 0, :2])
    gr = bwd(x, off, msk, wgt, g); jax.device_get(gr[0][0, 0, 0, :2])

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        o = fwd(x, off, msk, wgt)
    jax.device_get(o[0, 0, 0, :2])
    t_fwd = (time.perf_counter() - t0) / n * 1e3
    t0 = time.perf_counter()
    for _ in range(n):
        gr = bwd(x, off, msk, wgt, g)
    jax.device_get(gr[0][0, 0, 0, :2])
    t_bwd = (time.perf_counter() - t0) / n * 1e3
    print(f"shape {(b,h,w,c)}: fwd {t_fwd:.2f} ms  bwd {t_bwd:.2f} ms")
