"""End-to-end gs144000 stress run on the real chip (SURVEY §7 step 8).

Runs the FULL v1 pipeline (144k learnable anchors through backbone /
lifter / encoder / additive-splat head, reference
config/nuscenes_gs144000.py) forward at full size, plus one train step,
and records per-stage wall times, the splat pruning statistic, and the
VMEM table footprint. Prints one JSON line.

    python tools/bench_gs144000.py [--train]
"""
import sys
import time
import json

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.models import BEVSegmentor
    from gaussianformer_tpu.data.synthetic import SyntheticOccDataset
    from gaussianformer_tpu.ops.splat import splat_pruning_stats

    cfg = get_config("gs144000")
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
    print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

    @jax.jit
    def forward(variables, batch):
        out = model.apply(
            variables, batch["imgs"], batch["projection_mat"],
            batch["image_wh"], occ_xyz=batch["occ_xyz"],
            occ_label=batch["occ_label"],
            occ_cam_mask=batch["occ_cam_mask"], training=False,
            rng=jax.random.PRNGKey(0))
        return out["final_occ"], out["gaussian"].means, \
            out["gaussian"].scales

    t0 = time.perf_counter()
    occ, means, scales = forward(variables, batch)
    jax.device_get(occ[0, :2])
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        occ, means, scales = forward(variables, batch)
    jax.device_get(occ[0, :2])
    fwd_ms = (time.perf_counter() - t0) / n * 1e3

    stats = splat_pruning_stats(
        jnp.asarray(batch["occ_xyz"].reshape(-1, 3)),
        means[0], scales[0], cfg.head_cfg()["grid"],
        per_axis_radii=False)

    rec = {"metric": "gs144000_forward_ms", "value": round(fwd_ms, 1),
           "unit": "ms", "splat_blocks_fraction": round(
               stats["fraction"], 4),
           "pair_evals": stats["pair_evals"]}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
