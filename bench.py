"""Benchmark: flagship (GaussianFormer-2 Prob-64, 6400 Gaussians) 6-camera
inference FPS on one chip. Prints ONE JSON line.

Baseline target: >= 10 FPS on a single TPU chip (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_model_and_batch

    t_start = time.perf_counter()
    model, batch, cfg = _flagship_model_and_batch(small=False)
    print(f"# setup {time.perf_counter()-t_start:.1f}s", flush=True)
    rng = jax.random.PRNGKey(0)
    # jitted init: XLA dead-code-eliminates the forward, so this only
    # materializes the parameters.
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter()-t_start:.1f}s", flush=True)

    @jax.jit
    def forward(variables, imgs, projection_mat, image_wh, occ_xyz,
                occ_label, occ_cam_mask, key):
        out = model.apply(
            variables, imgs, projection_mat, image_wh,
            occ_xyz=occ_xyz, occ_label=occ_label, occ_cam_mask=occ_cam_mask,
            training=False, rng=key)
        return out["final_occ"]

    args = (variables, batch["imgs"], batch["projection_mat"],
            batch["image_wh"], batch["occ_xyz"], batch["occ_label"],
            batch["occ_cam_mask"])

    # warmup / compile (device_get forces a real host sync — on some
    # remote platforms block_until_ready returns early)
    jax.device_get(forward(*args, jax.random.PRNGKey(1))[:, :8])
    print(f"# compile+warmup {time.perf_counter()-t_start:.1f}s", flush=True)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = forward(*args, jax.random.PRNGKey(i))
    jax.device_get(out[:, :8])
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "prob_gs6400_infer_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
