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
    """Flagship init variables, npz-cached on disk.

    model.init is deterministic (PRNGKey(0)) but costs a jitted compile
    plus a remote program load per cold process (~30-150 s over the
    axon tunnel); the cache replaces that with one host->device upload.
    Keyed by the config repr + jax version; a model-code change that
    alters param SHAPES invalidates naturally (tree/shape check), one
    that only alters init VALUES requires deleting .cache_bench (the
    round protocol re-runs bench after the last code change anyway).
    """
    import hashlib
    import os
    import pickle

    import jax

    key = hashlib.sha256(
        (repr(cfg) + jax.__version__).encode()).hexdigest()[:16]
    path = f"/root/repo/.cache_bench/variables_{key}.pkl"
    if os.path.exists(path):
        try:
            import numpy as np

            with open(path, "rb") as f:
                host = pickle.load(f)
            # ONE packed transfer per dtype, unpacked by a jitted
            # slicing program: jax.device_put on the raw pytree moves
            # one leaf per call — ~900 tunnel round-trips, measured
            # 555 s over axon (vs ~15 s for the packed upload)
            leaves, treedef = jax.tree_util.tree_flatten(host)
            by_dt = {}
            for i, a in enumerate(leaves):
                by_dt.setdefault(np.dtype(a.dtype).name, []).append(i)
            packs = {dt: jax.device_put(np.concatenate(
                [leaves[i].ravel() for i in idxs]))
                for dt, idxs in by_dt.items()}

            shapes = [a.shape for a in leaves]
            sizes = [int(a.size) for a in leaves]

            def unpack(packs):
                offs = {dt: 0 for dt in packs}
                out = [None] * len(leaves)
                for dt, idxs in by_dt.items():
                    for i in idxs:
                        o = offs[dt]
                        out[i] = jax.lax.dynamic_slice_in_dim(
                            packs[dt], o, sizes[i]).reshape(shapes[i])
                        offs[dt] = o + sizes[i]
                return jax.tree_util.tree_unflatten(treedef, out)

            vs = jax.jit(unpack)(packs)
            jax.block_until_ready(vs)
            return vs
        except Exception:
            pass
    rng = jax.random.PRNGKey(0)
    # jitted init: XLA dead-code-eliminates the forward, so this only
    # materializes the parameters.
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import numpy as np
        with open(path, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(
                lambda a: np.asarray(a), variables), f)
    except Exception:
        pass
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
