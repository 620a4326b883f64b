"""In-model A/B of the deformable backend: full flagship forward with
backend="xla" vs backend="fused", one process, shared weights/batch.

    python tools/bench_model_deformable_ab.py
"""
import sys
import time
import dataclasses

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

    ds = SyntheticOccDataset(num_samples=1, image_size=(864, 1600),
                             grid=(200, 200, 16))
    s = ds[0]
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    rng = jax.random.PRNGKey(0)

    variables = None
    for backend in ("xla", "fused"):
        cfg = dataclasses.replace(get_config("prob_gs6400"),
                                  deformable_backend=backend)
        model = BEVSegmentor(**cfg.segmentor_cfg())
        if variables is None:
            t0 = time.perf_counter()
            variables = jax.jit(model.init, static_argnames=("training",))(
                {"params": rng, "dropout": rng}, batch["imgs"],
                batch["projection_mat"], batch["image_wh"],
                occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=False,
                rng=rng)
            print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

        @jax.jit
        def forward(variables, batch):
            out = model.apply(
                variables, batch["imgs"], batch["projection_mat"],
                batch["image_wh"], occ_xyz=batch["occ_xyz"],
                occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=False,
                rng=jax.random.PRNGKey(0))
            return out["final_occ"]

        t0 = time.perf_counter()
        occ = forward(variables, batch)
        jax.device_get(occ[0, :2])
        print(f"# {backend} compile+warmup {time.perf_counter()-t0:.1f}s",
              flush=True)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            occ = forward(variables, batch)
        jax.device_get(occ[0, :2])
        print(f"{backend}: {(time.perf_counter()-t0)/n*1e3:.1f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
