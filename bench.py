"""Benchmark: flagship (GaussianFormer-2 Prob-64, 6400 Gaussians) 6-camera
inference FPS on one chip. Prints ONE JSON line.

Baseline target: >= 10 FPS on a single TPU chip (BASELINE.md).

``--batch N`` measures frames/s/chip at batch N instead (amortizes the
per-dispatch host-gap tax — the deployment-shaped reading); the default
batch-1 line remains the official latency-honest metric.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _init_variables(model, batch, cfg):
    """Flagship init variables via jitted on-device init.

    XLA dead-code-eliminates the forward, so this only materializes the
    parameters, and its program persists in .jax_cache — consistently
    ~50 s over the axon tunnel. A disk cache of the parameter VALUES
    was measured and rejected: uploading ~150 MB of params costs
    54/165/439 s across runs of identical code (tunnel-bandwidth
    lottery), while shipping the init program is stable.
    """
    import jax

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    return variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--pipeline", type=int, default=0, metavar="K",
                    help="ALSO measure K forwards chained on-device in "
                    "one dispatch (lax.scan) — the serving-pipeline "
                    "reading with zero per-frame host involvement. "
                    "Off by default: compiling the scanned graph "
                    "roughly doubles bench compile time.")
    ns = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import (_flagship_model_and_batch,
                                 narrow_dcn_win_for_inference)

    t_start = time.perf_counter()
    model, batch, cfg = _flagship_model_and_batch(small=False,
                                                  batch=ns.batch)
    print(f"# setup {time.perf_counter()-t_start:.1f}s", flush=True)
    variables = _init_variables(model, batch, cfg)
    # narrowest DCN window the weights permit (zero init offsets -> 16;
    # params unchanged — the window is a static kernel shape)
    model, dcn_win = narrow_dcn_win_for_inference(model, cfg, variables)
    print(f"# init {time.perf_counter()-t_start:.1f}s (dcn_win={dcn_win})",
          flush=True)

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

    # pre-build the per-iter keys OUTSIDE the timed loop: PRNGKey()
    # construction + upload is per-iter host work that does not overlap
    # the device (part of the measured ~11 ms/frame dispatch gap)
    keys = [jax.device_put(jax.random.PRNGKey(i)) for i in range(10)]
    jax.block_until_ready(keys)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = forward(*args, keys[i])
    jax.device_get(out[:, :8])
    dt = (time.perf_counter() - t0) / iters

    if ns.pipeline:
        # K frames chained on-device in one dispatch: the per-frame cost
        # with the host/tunnel dispatch gap fully amortized (a serving
        # pipeline's sustained reading). Reported as a comment line; the
        # official metric stays the dispatch-per-frame loop above.
        k = ns.pipeline
        import jax.numpy as jnp

        @jax.jit
        def forward_k(variables, imgs_k, projection_mat, image_wh,
                      occ_xyz, occ_label, occ_cam_mask, keys):
            # per-frame images: scanning over identical inputs would let
            # XLA hoist every key-independent op (the whole tower stack)
            # out of the loop and report a fantasy number — measured
            # 98 ms/frame vs a 192 ms device floor before this fix
            def step(_, xs):
                key, imgs = xs
                out = model.apply(
                    variables, imgs, projection_mat, image_wh,
                    occ_xyz=occ_xyz, occ_label=occ_label,
                    occ_cam_mask=occ_cam_mask, training=False, rng=key)
                return None, out["final_occ"][:, :8]
            import jax.lax as lax
            _, outs = lax.scan(step, None, xs=(keys, imgs_k))
            return outs

        kkeys = jax.random.split(jax.random.PRNGKey(7), k)
        imgs_k = (batch["imgs"][None]
                  + jnp.arange(k, dtype=jnp.float32)[
                      :, None, None, None, None, None] * 1e-3)
        pargs = (variables, imgs_k, *args[2:])
        jax.device_get(forward_k(*pargs, kkeys))   # compile+warm
        t0 = time.perf_counter()
        jax.device_get(forward_k(*pargs, kkeys))
        dt_p = (time.perf_counter() - t0) / k
        print(f"# pipeline({k}): {dt_p*1e3:.1f} ms/frame = "
              f"{ns.batch/dt_p:.3f} frames/s", flush=True)

    fps = ns.batch / dt
    metric = ("prob_gs6400_infer_fps_per_chip" if ns.batch == 1 else
              f"prob_gs6400_infer_fps_per_chip_b{ns.batch}")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
