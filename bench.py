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

    from __graft_entry__ import _flagship_model_and_batch

    model, batch, cfg = _flagship_model_and_batch(small=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)

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

    # warmup / compile
    forward(*args, jax.random.PRNGKey(1)).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        forward(*args, jax.random.PRNGKey(i)).block_until_ready()
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
