"""Stress-test the splat at GaussianFormer-v1 scale: 144,000 Gaussians x
640k query voxels (config nuscenes_gs144000, SURVEY §7 step 8).

Prints forward timing for the Pallas kernel plus the chunk-skip pruning
statistic (the TPU analog of the reference's num_rendered count).

    python tools/bench_splat144k.py [P] [tile_n] [chunk_g]
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
    from gaussianformer_tpu.ops.splat import (SplatGridSpec, splat,
                                              splat_pruning_stats)

    p = int(sys.argv[1]) if len(sys.argv) > 1 else 144000
    tile_n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    chunk_g = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    c = 18
    grid = SplatGridSpec(H=200, W=200, D=16, pc_min=(-50.0, -50.0, -5.0),
                         grid_size=0.5, scale_multiplier=2.5)

    rng = np.random.RandomState(0)
    xs = np.linspace(-49.75, 49.75, 200)
    zs = np.linspace(-4.75, 2.75, 16)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pts = jnp.asarray(
        np.stack([gx, gy, gz], -1).reshape(1, -1, 3), jnp.float32)

    means = jnp.asarray(rng.uniform(
        [-50, -50, -5], [50, 50, 3], (1, p, 3)), jnp.float32)
    # v1 scale_range (0.08, 0.64) → small Gaussians
    scales = jnp.asarray(rng.uniform(0.08, 0.64, (1, p, 3)), jnp.float32)
    opas = jnp.asarray(rng.rand(1, p), jnp.float32)
    sem = jnp.asarray(rng.rand(1, p, c), jnp.float32)
    a = rng.randn(p, 3, 3).astype(np.float32)
    spd = np.einsum("pij,pkj->pik", a, a) / 3 + np.eye(3) * 2.0
    cov6 = jnp.asarray(np.stack(
        [spd[:, 0, 0], spd[:, 1, 1], spd[:, 2, 2],
         spd[:, 0, 1], spd[:, 1, 2], spd[:, 0, 2]], -1)[None], jnp.float32)

    stats = splat_pruning_stats(pts[0], means[0], scales[0], grid,
                                tile_n=tile_n, chunk_g=chunk_g)
    print(f"# pruning: {stats['blocks_computed']}/{stats['blocks_total']} "
          f"blocks ({100 * stats['fraction']:.1f}%), "
          f"{stats['pair_evals'] / 1e9:.2f}G pair evals "
          f"(dense would be {pts.shape[1] * p / 1e9:.1f}G)", flush=True)

    fwd = jax.jit(lambda *a: splat(
        *a, grid, variant="additive", per_axis_radii=True,
        backend="pallas", pallas_tile_n=tile_n, pallas_chunk_g=chunk_g))
    out = fwd(pts, means, opas, sem, scales, cov6)
    jax.device_get(out[0][0, :2])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = fwd(pts, means, opas, sem, scales, cov6)
    jax.device_get(out[0][0, :2])
    dt = (time.perf_counter() - t0) / iters
    print(f"splat gs{p} additive fwd: {dt * 1e3:.1f} ms "
          f"(tile_n={tile_n}, chunk_g={chunk_g})")


if __name__ == "__main__":
    main()
