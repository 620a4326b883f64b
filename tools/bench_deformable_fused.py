"""A/B the deformable backends at flagship shapes: XLA chunked gather vs
the fused Pallas kernel (forward and forward+backward).

    python tools/bench_deformable_fused.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from gaussianformer_tpu.ops.deformable import (
        deformable_aggregation, deformable_aggregation_fused,
        deformable_fused_spill_stats, pack_feature_maps)

    rng = np.random.RandomState(0)
    b, cams, c, groups, pts_n = 1, 6, 128, 4, 7
    shapes = tuple((h, w) for h, w in
                   [(108, 200), (54, 100), (27, 50), (14, 25)])
    p = 6400
    q = p * pts_n
    fmaps = [jnp.asarray(rng.randn(b, cams, h, w, c) * 0.3, jnp.bfloat16)
             for h, w in shapes]
    pts = jnp.asarray(rng.uniform(-0.05, 1.05, (b, q, cams, 2)),
                      jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, cams, len(shapes), groups), jnp.float32), axis=-2)
    cot = jnp.asarray(rng.randn(b, p, c), jnp.float32)

    print(deformable_fused_spill_stats(np.asarray(pts), pts_n, shapes),
          flush=True)

    packed = jax.jit(lambda f: pack_feature_maps(f)[0])(fmaps)

    def xla_anchor(fl, p_, w_):
        out = deformable_aggregation((fl, shapes), p_, w_, groups)
        return out.reshape(b, p, pts_n, c).sum(2)

    def fused_anchor(fm, p_, w_):
        return deformable_aggregation_fused(fm, p_, w_, groups, pts_n)

    for name, fn, feats in (("xla", xla_anchor, packed),
                            ("fused", fused_anchor, fmaps)):
        f = jax.jit(fn)
        out = f(feats, pts, wts)
        jax.device_get(out[0, 0, :2])
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(feats, pts, wts)
        jax.device_get(out[0, 0, :2])
        fwd_ms = (time.perf_counter() - t0) / n * 1e3

        g = jax.jit(jax.grad(
            lambda feats, p_, w_: jnp.sum(fn(feats, p_, w_) * cot),
            argnums=(0, 1, 2)))
        go = g(feats, pts, wts)
        jax.device_get(jax.tree_util.tree_leaves(go)[0].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(n):
            go = g(feats, pts, wts)
        jax.device_get(jax.tree_util.tree_leaves(go)[0].ravel()[:2])
        bwd_ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: fwd {fwd_ms:.2f} ms  fwd+bwd {bwd_ms:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
