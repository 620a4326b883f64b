"""Per-stage wall-clock profile of the flagship (prob_gs6400) forward.

Each stage is jitted and timed in isolation at full flagship shapes, so the
sum of stages approximates the end-to-end bench forward (bench.py). Run on
the real TPU chip:

    python tools/profile_stages.py [--stages backbone,init,...]

Prints one line per stage: median ms over ITERS runs.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 5


def _sync(out):
    """device_get one element of the first leaf: a PJRT execution's output
    buffers become ready together, so one probe syncs the whole call
    (axon's block_until_ready can return before execution finishes, and
    probing every leaf would pay the tunnel round-trip per leaf)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    while leaf.ndim > 0:
        leaf = leaf[0]
    jax.device_get(leaf)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    print(f"{name:<28s} {ms:9.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stages", default="all")
    args = parser.parse_args()
    want = args.stages.split(",")

    def on(s):
        return "all" in want or s in want

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.models.backbone.resnet import ResNet
    from gaussianformer_tpu.models.neck.fpn import FPN
    from gaussianformer_tpu.models.lifter.initializer import ResNetSecondFPN
    from gaussianformer_tpu.models.lifter.gaussian_lifter_v2 import (
        GaussianLifterV2)
    from gaussianformer_tpu.models.encoder.gaussian_encoder import (
        GaussianOccEncoder)
    from gaussianformer_tpu.models.head.gaussian_head import GaussianHead
    from gaussianformer_tpu.models.encoder.modules import GaussianPrediction
    from gaussianformer_tpu.ops.fps import farthest_point_sampling

    cfg = get_config("prob_gs6400")
    rng = jax.random.PRNGKey(0)
    B, N, H, W = 1, 6, 864, 1600
    P = cfg.total_anchors
    imgs = jax.random.normal(rng, (B, N, H, W, 3), jnp.float32)
    flat_imgs = imgs.reshape(B * N, H, W, 3)
    # plausible projection matrices: intrinsics @ [R|t]
    proj = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for i in range(N):
        proj[:, i, 0, 0] = 1200.0
        proj[:, i, 1, 1] = 1200.0
        proj[:, i, 0, 2] = W / 2
        proj[:, i, 1, 2] = H / 2
        th = 2 * np.pi * i / N
        rot = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]],
                       np.float32)
        proj[:, i, :3, :3] = proj[:, i, :3, :3] @ rot
    projection_mat = jnp.asarray(proj)
    image_wh = jnp.full((B, N, 2), 0.0).at[..., 0].set(W).at[..., 1].set(H)

    total = 0.0

    # dispatch/tunnel overhead baseline: a trivial jitted op
    triv = jax.jit(lambda x: x + 1.0)
    timed("overhead(baseline)", triv, jnp.zeros((8, 128)))

    # ---- main tower -------------------------------------------------
    if on("backbone"):
        bb = ResNet(**{**cfg.backbone_cfg(),
                       "dtype": jnp.dtype(cfg.compute_dtype)})
        neck = FPN(**{**cfg.neck_cfg(), "dtype": jnp.dtype(cfg.compute_dtype)})
        v_bb = jax.jit(bb.init)(rng, flat_imgs)
        feats_shape = jax.eval_shape(lambda v, x: bb.apply(v, x), v_bb,
                                     flat_imgs)
        fake_feats = [jnp.zeros(s.shape, s.dtype) for s in feats_shape]
        v_neck = jax.jit(neck.init)(rng, fake_feats)

        bb_fn = jax.jit(lambda v, x: bb.apply(v, x))
        total += timed("backbone(R101+DCN)", bb_fn, v_bb, flat_imgs)
        neck_fn = jax.jit(lambda v, f: neck.apply(v, f))
        total += timed("neck(FPN)", neck_fn, v_neck, fake_feats)
        ms_feats = [
            jnp.zeros((B, N) + s.shape[1:], s.dtype)
            for s in jax.eval_shape(lambda v, f: neck.apply(v, f), v_neck,
                                    fake_feats)
        ]
    else:
        shapes = [(B, N, H // 8, W // 8, 128), (B, N, H // 16, W // 16, 128),
                  (B, N, H // 32, W // 32, 128),
                  (B, N, H // 64, W // 64, 128)]
        ms_feats = [jnp.zeros(s, jnp.bfloat16) for s in shapes]

    # ---- initializer tower ------------------------------------------
    if on("init"):
        init_bb = ResNetSecondFPN(dtype=cfg.compute_dtype)
        v_init = jax.jit(init_bb.init)(rng, flat_imgs)
        init_fn = jax.jit(lambda v, x: init_bb.apply(v, x))
        total += timed("initializer(R101+SFPN)", init_fn, v_init, flat_imgs)
        sf_shape = jax.eval_shape(lambda v, x: init_bb.apply(v, x), v_init,
                                  flat_imgs)
        sf_out = jnp.zeros((B, N) + sf_shape.shape[1:], sf_shape.dtype)
    else:
        sf_out = jnp.zeros((B, N, H // 8, W // 8, 512), jnp.float32)

    # ---- lifter (given secondfpn features) ---------------------------
    if on("lifter"):
        lifter = GaussianLifterV2(**cfg.lifter_cfg())
        v_lift = jax.jit(
            lifter.init,
            static_argnames=("compute_gt",))(
            rng, imgs, projection_mat, image_wh, secondfpn_out=sf_out,
            rng=rng, compute_gt=False)
        lift_fn = jax.jit(lambda v, sf, key: lifter.apply(
            v, imgs, projection_mat, image_wh, secondfpn_out=sf,
            rng=key, compute_gt=False))
        total += timed("lifter(sample+FPS)", lift_fn, v_lift, sf_out, rng)

    if on("fps"):
        cand = jax.random.uniform(rng, (129600, 3)) * 100 - 50
        fps_fn = jax.jit(lambda c: farthest_point_sampling(c, 4000))
        timed("  fps alone(129600→4000)", fps_fn, cand)

    # ---- encoder ------------------------------------------------------
    anchor = jax.random.normal(rng, (B, P, 10 + 1 + cfg.semantic_dim)) * 0.1
    feats128 = jax.random.normal(rng, (B, P, cfg.embed_dims)) * 0.1

    def enc_for(order):
        e_cfg = dict(cfg.encoder_cfg())
        e_cfg["operation_order"] = order
        enc = GaussianOccEncoder(**e_cfg)
        v = jax.jit(enc.init, static_argnames=("deterministic",))(
            {"params": rng, "dropout": rng}, anchor, feats128, ms_feats,
            projection_mat, image_wh, deterministic=True)
        fn = jax.jit(lambda v, a, f: jax.tree_util.tree_map(
            lambda x: x[0, 0] if hasattr(x, "ndim") and x.ndim >= 2 else x,
            enc.apply(v, a, f, ms_feats, projection_mat, image_wh,
                      deterministic=True)))
        return fn, v

    if on("encoder"):
        fn, v = enc_for(cfg.operation_order)
        total += timed("encoder(full 4 blocks)", fn, v, anchor, feats128)
    if on("encoder_parts"):
        fn, v = enc_for(("identity", "deformable", "add", "norm") * 4)
        timed("  4x deformable", fn, v, anchor, feats128)
        fn, v = enc_for(("identity", "spconv", "add", "norm") * 4)
        timed("  4x spconv", fn, v, anchor, feats128)
        fn, v = enc_for(("identity", "ffn", "add", "norm") * 8)
        timed("  8x ffn", fn, v, anchor, feats128)
        fn, v = enc_for(("refine",) * 4)
        timed("  4x refine", fn, v, anchor, feats128)

    # ---- head / splat --------------------------------------------------
    if on("head"):
        head = GaussianHead(**cfg.head_cfg())
        pred = GaussianPrediction(
            means=jax.random.uniform(rng, (B, P, 3)) * 80 - 40,
            scales=jax.random.uniform(rng, (B, P, 3)) * 0.8 + 0.05,
            rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, P, 1)),
            opacities=jax.random.uniform(rng, (B, P, 1)),
            semantics=jax.random.normal(rng, (B, P, cfg.semantic_dim)),
        )
        occ_xyz = jax.random.uniform(rng, (B, 200, 200, 16, 3)) * 100 - 50
        occ_label = jnp.zeros((B, 200, 200, 16), jnp.int32)
        occ_mask = jnp.ones((B, 200, 200, 16), bool)
        v_head = jax.jit(head.init, static_argnames=("training",))(
            rng, [pred], occ_xyz, occ_label, occ_mask, training=False)
        head_fn = jax.jit(lambda v, p: head.apply(
            v, [p], occ_xyz, occ_label, occ_mask, training=False))
        total += timed("head(GMM splat)", head_fn, v_head, pred)

    print(f"{'TOTAL (sum of stages)':<28s} {total:9.1f} ms")


if __name__ == "__main__":
    main()
