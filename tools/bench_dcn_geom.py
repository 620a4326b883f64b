"""Microbench: Pallas DCN block across (win, tile) geometries at the two
R101 DCN stage shapes of the flagship towers.

The M-matmul does 9*win^2*C FLOPs per output pixel (vs 9*C for a dense
conv), so smaller windows cut MXU work quadratically; smaller tiles cut
the usable window but multiply the per-tile fixed cost. Offset-margin
per geometry is (win - tile - 3) / 2.

    python tools/bench_dcn_geom.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import functools
import jax
import jax.numpy as jnp
from gaussianformer_tpu.ops.pallas.dcn_kernel import (
    deform_conv2d_pallas_fwd, deform_conv2d_pallas_bwd)

key = jax.random.PRNGKey(0)
GEOMS = [(24, 8), (16, 4), (20, 8), (24, 4), (32, 16), (16, 8)]

for (b, h, w, c) in [(6, 54, 100, 256), (6, 27, 50, 512)]:
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    off = jax.random.normal(key, (b, h, w, 18), jnp.float32) * 1.5
    msk = jax.nn.sigmoid(jax.random.normal(key, (b, h, w, 9), jnp.float32))
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
    g = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    # reference output from the default geometry (offsets are within
    # every geometry's margin, so results must agree)
    ref = None

    for win, tile in GEOMS:
        margin = (win - tile - 3) / 2
        try:
            fwd = jax.jit(functools.partial(
                deform_conv2d_pallas_fwd, win=win, tile=tile))
            bwd = jax.jit(functools.partial(
                deform_conv2d_pallas_bwd, win=win, tile=tile))
            o = fwd(x, off, msk, wgt)
            jax.device_get(o[0, 0, 0, :2])
            if ref is None:
                ref = o
            err = float(jnp.max(jnp.abs(
                (o.astype(jnp.float32) - ref.astype(jnp.float32)))))
            gr = bwd(x, off, msk, wgt, g)
            jax.device_get(gr[0][0, 0, 0, :2])
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
            print(f"shape {(b, h, w, c)} win={win:2d} tile={tile:2d} "
                  f"margin={margin:4.1f}px: fwd {t_fwd:6.2f} ms  "
                  f"bwd {t_bwd:6.2f} ms  maxerr {err:.3e}", flush=True)
        except Exception as e:
            print(f"shape {(b, h, w, c)} win={win:2d} tile={tile:2d}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
