"""Bench the remaining model-zoo rows on the real chip (VERDICT r4 #7):
one JSON line per config with forward ms + FPS, completing the
reference's 5-config table (/root/reference/readme.md:105-111; flagship
prob_gs6400 is bench.py, gs144000 is tools/bench_gs144000.py).

    python tools/bench_zoo.py [--configs gs25600_solid,prob_gs12800,...]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def bench_config(name: str, iters: int = 5):
    import jax
    import jax.numpy as jnp

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.models import BEVSegmentor
    from gaussianformer_tpu.data.synthetic import SyntheticOccDataset
    from __graft_entry__ import narrow_dcn_win_for_inference

    cfg = get_config(name)
    model = BEVSegmentor(**cfg.segmentor_cfg())
    ds = SyntheticOccDataset(num_samples=1, image_size=(864, 1600),
                             grid=(200, 200, 16))
    s = ds[0]
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng}, batch["imgs"],
        batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    model, dcn_win = narrow_dcn_win_for_inference(model, cfg, variables)
    print(f"# {name}: init {time.perf_counter() - t0:.1f}s "
          f"(dcn_win={dcn_win})", flush=True)

    @jax.jit
    def forward(variables, imgs, projection_mat, image_wh, occ_xyz,
                occ_label, occ_cam_mask, key):
        out = model.apply(
            variables, imgs, projection_mat, image_wh, occ_xyz=occ_xyz,
            occ_label=occ_label, occ_cam_mask=occ_cam_mask,
            training=False, rng=key)
        return out["final_occ"]

    args = (variables, batch["imgs"], batch["projection_mat"],
            batch["image_wh"], batch["occ_xyz"], batch["occ_label"],
            batch["occ_cam_mask"])
    jax.device_get(forward(*args, jax.random.PRNGKey(1))[:, :8])
    print(f"# {name}: compile+warmup {time.perf_counter() - t0:.1f}s",
          flush=True)

    keys = [jax.device_put(jax.random.PRNGKey(i)) for i in range(iters)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for i in range(iters):
        out = forward(*args, keys[i])
    jax.device_get(out[:, :8])
    dt = (time.perf_counter() - t0) / iters
    rec = {"metric": f"{name}_infer", "forward_ms": round(dt * 1e3, 1),
           "fps": round(1.0 / dt, 3), "dcn_win": dcn_win}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="gs25600_solid,prob_gs12800,prob_gs25600")
    ap.add_argument("--iters", type=int, default=5)
    ns = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    recs = [bench_config(c.strip(), ns.iters)
            for c in ns.configs.split(",") if c.strip()]
    print(json.dumps({"zoo": recs}))


if __name__ == "__main__":
    main()
