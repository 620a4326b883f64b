"""Diagnose where cold-process compile+warmup time goes: trace (python),
lower, compile (persistent-cache lookup), first execution (remote Mosaic
loads), steady state. Also prints the cache key JAX computes so
back-to-back runs can be compared for key determinism.

Usage: python tools/diag_compile.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    t00 = time.perf_counter()

    def t(msg):
        print(f"# {time.perf_counter()-t00:7.1f}s  {msg}", flush=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_explain_cache_misses", True)
    t("jax imported")

    from __graft_entry__ import _flagship_model_and_batch
    model, batch, cfg = _flagship_model_and_batch(small=False)
    t("model+batch built")

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    t("init done")

    def forward(variables, imgs, projection_mat, image_wh, occ_xyz,
                occ_label, occ_cam_mask, key):
        out = model.apply(
            variables, imgs, projection_mat, image_wh,
            occ_xyz=occ_xyz, occ_label=occ_label, occ_cam_mask=occ_cam_mask,
            training=False, rng=key)
        return out["final_occ"]

    args = (variables, batch["imgs"], batch["projection_mat"],
            batch["image_wh"], batch["occ_xyz"], batch["occ_label"],
            batch["occ_cam_mask"], jax.random.PRNGKey(1))

    jitted = jax.jit(forward)
    lowered = jitted.lower(*args)
    t("lowered (python trace + StableHLO)")

    compiled = lowered.compile()
    t("compiled (includes persistent-cache lookup / remote compile)")

    out = compiled(*args)
    jax.device_get(out[:, :8])
    t("first execution done (remote program load)")

    out = compiled(*args)
    jax.device_get(out[:, :8])
    t("second execution done")

    t0 = time.perf_counter()
    for i in range(10):
        out = compiled(*args)
    jax.device_get(out[:, :8])
    t(f"10 steady iters: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")


if __name__ == "__main__":
    main()
