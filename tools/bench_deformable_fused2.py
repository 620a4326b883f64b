"""Fused deformable cost split: bare kernel vs full wrapper, with
REALISTIC clustered key points (7 pts jittered around per-anchor centers
— the model's key points cluster; uniform-random points over-spill).

    python tools/bench_deformable_fused2.py [a_chunk_scale]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import gaussianformer_tpu.ops.deformable as D
    from gaussianformer_tpu.ops.pallas.deformable_kernel import (
        deformable_fused_fwd)

    rng = np.random.RandomState(0)
    b, cams, c, groups, pts_n = 1, 6, 128, 4, 7
    shapes = tuple((h, w) for h, w in
                   [(108, 200), (54, 100), (27, 50), (14, 25)])
    p = 6400
    q = p * pts_n
    fmaps = [jnp.asarray(rng.randn(b, cams, h, w, c) * 0.3, jnp.bfloat16)
             for h, w in shapes]
    # clustered: per (anchor, cam) center, pts jitter ±1.5% of the image
    centers = rng.uniform(-0.05, 1.05, (b, p, 1, cams, 2))
    jit = rng.uniform(-0.015, 0.015, (b, p, pts_n, cams, 2))
    pts = jnp.asarray((centers + jit).reshape(b, q, cams, 2), jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, cams, len(shapes), groups), jnp.float32), axis=-2)

    print(D.deformable_fused_spill_stats(np.asarray(pts), pts_n, shapes),
          flush=True)

    full = jax.jit(lambda fm, p_, w_: D.deformable_aggregation_fused(
        fm, p_, w_, groups, pts_n))
    out = full(fmaps, pts, wts); jax.device_get(out[0, 0, :2])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = full(fmaps, pts, wts)
    jax.device_get(out[0, 0, :2])
    print(f"full fused fwd: {(time.perf_counter()-t0)/n*1e3:.2f} ms",
          flush=True)

    # bare kernel: prebuild chunk inputs once, time only the pallas_call
    wx = D._window_widths(shapes)
    a_chunk = D._fused_chunk_geometry(pts_n)
    feats1 = tuple(
        jnp.pad(f[0], ((0, 0), (0, 0),
                       (0, D._pad8(f.shape[3]) - f.shape[3]), (0, 0))
                ).astype(jnp.bfloat16) for f in fmaps)
    s_len = a_chunk * pts_n
    nchunk = (p // a_chunk) * cams
    uvq = jnp.asarray(rng.rand(nchunk, s_len, 8), jnp.float32) * 0.9
    wk = jnp.asarray(rng.rand(nchunk, s_len, 16), jnp.float32)
    starts = np.zeros((nchunk, 8), np.int32)
    starts[:, 0] = rng.randint(0, cams, nchunk)
    starts[:, 1] = 1
    starts[:, 2] = rng.randint(0, (shapes[0][1] - wx[0]) // 8, nchunk)
    starts[:, 3] = rng.randint(0, (shapes[1][1] - wx[1]) // 8, nchunk)
    starts = jnp.asarray(starts)
    bare = jax.jit(lambda f, u, w, st: deformable_fused_fwd(
        f, u, w, st, shapes=shapes, wx=wx, num_pts=pts_n,
        a_chunk=a_chunk))
    o = bare(feats1, uvq, wk, starts); jax.device_get(o[0, 0, :2])
    t0 = time.perf_counter()
    for _ in range(n):
        o = bare(feats1, uvq, wk, starts)
    jax.device_get(o[0, 0, :2])
    print(f"bare kernel ({nchunk} chunks, all valid): "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
