"""Microbenchmark deformable_aggregation layout variants at flagship
shapes (Q = 6400 anchors x 7 pts, 6 cams, 4 levels, C=128, bf16 maps).

    python tools/bench_deformable.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from gaussianformer_tpu.ops.deformable import (deformable_aggregation,
                                                   pack_feature_maps)

    rng = np.random.RandomState(0)
    b, cams, c, groups = 1, 6, 128, 4
    shapes = [(108, 200), (54, 100), (27, 50), (14, 25)]
    q = 6400 * 7
    fmaps = [jnp.asarray(rng.randn(b, cams, h, w, c) * 0.3, jnp.bfloat16)
             for h, w in shapes]
    pts = jnp.asarray(rng.uniform(-0.05, 1.05, (b, q, cams, 2)), jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, cams, len(shapes), groups), jnp.float32), axis=-2)

    # pack outside the timed op (in-model it is hoisted out of the
    # decoder loop and shared by all 4 deformable calls)
    packed = jax.jit(lambda f: pack_feature_maps(f)[0])(fmaps)
    shapes_static = tuple((h, w) for h, w in shapes)
    f = jax.jit(lambda fl, p_, w_: deformable_aggregation(
        (fl, shapes_static), p_, w_, groups))
    out = f(packed, pts, wts)
    jax.device_get(out[0, 0, :2])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = f(packed, pts, wts)
    jax.device_get(out[0, 0, :2])
    print(f"deformable_aggregation: "
          f"{(time.perf_counter() - t0) / iters * 1e3:.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
