"""bf16 fidelity drift at full scale (VERDICT r4 #5): the towers run
bf16 by default (configs compute_dtype="bfloat16") while every parity
test asserts at fp32/small scale. This measures, on the real chip at
flagship size (6 x 864x1600):

  1. fp32-vs-bf16 relative error of the main-tower FPN features, and
  2. end-to-end `final_occ` label disagreement rate + bin_logits /
     pred_occ deltas for the full flagship forward,

with IDENTICAL parameters (compute dtype is activation-only; params are
fp32 either way). Prints one JSON line; commit the result to
docs/BF16_DRIFT.md.

    python tools/bf16_drift.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

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

    cfg32 = dataclasses.replace(get_config("prob_gs6400"),
                                compute_dtype="float32")
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    ds = SyntheticOccDataset(num_samples=1, image_size=(864, 1600),
                             grid=(200, 200, 16))
    s = ds[0]
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    rng = jax.random.PRNGKey(0)

    m32 = BEVSegmentor(**cfg32.segmentor_cfg())
    m16 = BEVSegmentor(**cfg16.segmentor_cfg())
    t0 = time.perf_counter()
    variables = jax.jit(m32.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng}, batch["imgs"],
        batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter()-t0:.1f}s", flush=True)

    # ---- 1. tower drift: main R101(+DCN)+FPN features at full res
    from gaussianformer_tpu.models.backbone.resnet import ResNet
    from gaussianformer_tpu.models.neck.fpn import FPN

    def tower(dtype, imgs):
        bcfg = dict(cfg32.backbone_cfg(), dtype=dtype, with_cp=False)
        ncfg = dict(cfg32.neck_cfg(), dtype=dtype)

        def run(p, bs, x):
            import flax.linen as nn

            class Tower(nn.Module):
                @nn.compact
                def __call__(self, x):
                    feats = ResNet(**bcfg, name="img_backbone")(x)
                    return FPN(**ncfg, name="img_neck")(feats)

            return Tower().apply({"params": p, "batch_stats": bs}, x)
        return run

    p = {"img_backbone": variables["params"]["img_backbone"],
         "img_neck": variables["params"]["img_neck"]}
    bs = {"img_backbone": variables["batch_stats"]["img_backbone"]}
    flat_imgs = batch["imgs"].reshape((-1,) + batch["imgs"].shape[2:])
    f32 = jax.jit(tower(jnp.float32, flat_imgs))(p, bs, flat_imgs)
    f16 = jax.jit(tower(jnp.bfloat16, flat_imgs))(p, bs, flat_imgs)
    tower_rel = []
    for l, (a, b) in enumerate(zip(f32, f16)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-12))
        mx = float(np.abs(a - b).max())
        tower_rel.append({"level": l, "mean_rel": round(rel, 5),
                          "max_abs": round(mx, 4)})
        print(f"# fpn level {l}: mean rel {rel:.2e}, max abs {mx:.3f}",
              flush=True)

    # ---- 2. end-to-end label disagreement
    def forward(model):
        @jax.jit
        def f(variables, key):
            out = model.apply(
                variables, batch["imgs"], batch["projection_mat"],
                batch["image_wh"], occ_xyz=batch["occ_xyz"],
                occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=False,
                rng=key)
            return out["final_occ"], out["bin_logits"], out["pred_occ"][-1]
        return f

    key = jax.random.PRNGKey(1)
    occ32, bl32, po32 = forward(m32)(variables, key)
    occ16, bl16, po16 = forward(m16)(variables, key)
    occ32 = np.asarray(occ32)
    occ16 = np.asarray(occ16)
    disagree = float((occ32 != occ16).mean())
    bl_delta = float(np.abs(np.asarray(bl32) - np.asarray(bl16)).max())
    po_delta = float(np.abs(np.asarray(po32, np.float32)
                            - np.asarray(po16, np.float32)).max())
    # disagreements concentrated at decision boundaries are benign;
    # report the fraction whose fp32 bin_logit is far from the 0.5
    # threshold as the "hard" disagreement
    bl32f = np.asarray(bl32, np.float32).reshape(occ32.shape)
    hard = float(((occ32 != occ16)
                  & (np.abs(bl32f - 0.5) > 0.1)).mean())

    # ---- 3. mechanism: is the disagreement amplified by the lifter's
    # DISCRETE anchor selection (FPS/top-k index flips on ~1% feature
    # noise → disjoint Gaussian sets), rather than by smooth numeric
    # drift? Compare the final refined Gaussian means per anchor slot
    # (same slot index = same selection lineage) and as sets.
    def rep(model):
        @jax.jit
        def f(variables, key):
            out = model.apply(
                variables, batch["imgs"], batch["projection_mat"],
                batch["image_wh"], occ_xyz=batch["occ_xyz"],
                occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=False,
                rng=key, rep_only=True)
            return out["representation"][-1].means
        return f

    mean32 = np.asarray(rep(m32)(variables, key), np.float32)[0]
    mean16 = np.asarray(rep(m16)(variables, key), np.float32)[0]
    slot_dist = np.linalg.norm(mean32 - mean16, axis=-1)
    # set distance, subsampled: for 512 bf16 anchors, nearest fp32 anchor
    sub = mean16[:: max(1, mean16.shape[0] // 512)]
    d2 = np.linalg.norm(sub[:, None, :] - mean32[None, :, :], axis=-1)
    nn_dist = d2.min(axis=1)
    anchor_stats = {
        "slot_mean_dist_m": round(float(slot_dist.mean()), 4),
        "slot_frac_moved_gt_1m": round(float((slot_dist > 1.0).mean()), 4),
        "set_nn_median_dist_m": round(float(np.median(nn_dist)), 4),
    }
    print(f"# anchor slots: mean |Δmeans| {anchor_stats['slot_mean_dist_m']}"
          f" m, frac >1 m {anchor_stats['slot_frac_moved_gt_1m']};"
          f" set-NN median {anchor_stats['set_nn_median_dist_m']} m",
          flush=True)

    rec = {"metric": "bf16_drift_flagship",
           "final_occ_disagree_frac": round(disagree, 6),
           "final_occ_disagree_hard_frac": round(hard, 6),
           "bin_logits_max_delta": round(bl_delta, 5),
           "pred_occ_max_delta": round(po_delta, 5),
           "anchor": anchor_stats,
           "tower_fpn": tower_rel}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
