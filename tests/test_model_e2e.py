"""End-to-end smoke tests on tiny shapes: init + forward + train step."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.models.segmentor import BEVSegmentor
from gaussianformer_tpu.ops.splat import SplatGridSpec


GRID = SplatGridSpec(H=10, W=10, D=4, pc_min=(-5.0, -5.0, -1.0),
                     grid_size=1.0, scale_multiplier=4.0)
PC_RANGE = (-5.0, -5.0, -1.0, 5.0, 5.0, 3.0)
EMBED = 32
SEM_DIM = 5
NUM_CLASSES = 6
N_CAMS = 2
IMG_H, IMG_W = 32, 48


def tiny_segmentor(version=2):
    op_order_v2 = (
        "identity", "deformable", "add", "norm",
        "identity", "ffn", "add", "norm",
        "identity", "spconv", "add", "norm",
        "refine",
    )
    op_order_v1 = ("deformable", "ffn", "norm", "refine")
    common_enc = dict(
        embed_dims=EMBED, include_opa=True, semantic_dim=SEM_DIM,
        ffn_cfg=dict(embed_dims=EMBED, feedforward_channels=EMBED * 2,
                     ffn_drop=0.1, add_identity=version == 1,
                     in_channels=EMBED * 2 if version == 1 else None),
        deformable_cfg=dict(
            embed_dims=EMBED, num_groups=4, num_levels=4, num_cams=N_CAMS,
            attn_drop=0.1, use_camera_embed=True,
            residual_mode="cat" if version == 1 else "none",
            num_learnable_pts=2, learnable_fixed_scale=2.0,
            pc_range=PC_RANGE, scale_range=(0.1, 2.0)),
        spconv_cfg=dict(in_channels=EMBED, embed_channels=EMBED,
                        pc_range=PC_RANGE, grid_size=(1.0, 1.0, 1.0),
                        kernel_size=3, use_out_proj=True,
                        use_multi_layer=version == 2),
        refine_version=version,
    )
    refine_cfg = dict(embed_dims=EMBED, pc_range=PC_RANGE,
                      scale_range=(0.1, 2.0), unit_xyz=(1.0, 1.0, 0.5),
                      semantic_dim=SEM_DIM, include_opa=True,
                      semantics_activation="identity")
    if version == 1:
        refine_cfg.update(restrict_xyz=True, refine_manual=(0, 1, 2))

    if version == 2:
        lifter_cfg = dict(
            num_anchor=24, embed_dims=EMBED, semantic_dim=SEM_DIM,
            include_opa=True, num_samples=8, pc_range=PC_RANGE,
            voxel_size=1.0, occ_resolution=(10, 10, 4), empty_label=5,
            random_samples=8, use_initializer=True, initializer_depth=18,
            initializer_dcn=(False, False, False, False),
            gt_bin_chunk=4, depth_max=12.0)
    else:
        lifter_cfg = dict(num_anchor=32, embed_dims=EMBED,
                          semantic_dim=SEM_DIM, include_opa=True)

    return BEVSegmentor(
        backbone_cfg=dict(depth=18, out_indices=(0, 1, 2, 3),
                          style="pytorch",
                          stage_with_dcn=(False, False, False, False),
                          with_cp=False, base_channels=8),
        neck_cfg=dict(out_channels=EMBED, num_outs=4, start_level=1,
                      add_extra_convs="on_output",
                      relu_before_extra_convs=True),
        lifter_type="v2" if version == 2 else "v1",
        lifter_cfg=lifter_cfg,
        encoder_cfg=dict(
            operation_order=op_order_v2 if version == 2 else op_order_v1,
            refine_cfg=refine_cfg, **common_enc),
        head_cfg=dict(
            apply_loss_type="random_1", num_classes=NUM_CLASSES,
            empty_label=5, with_empty=version == 1,
            use_localaggprob=version == 2, combine_geosem=version == 2,
            empty_mean=(0.0, 0.0, 0.0), empty_scale=(10.0, 10.0, 4.0),
            grid=GRID, per_axis_radii=False,
            splat_tile_n=64, splat_chunk_g=16),
    )


def make_batch(rng, b=1):
    imgs = rng.randn(b, N_CAMS, IMG_H, IMG_W, 3).astype(np.float32)
    # simple pinhole-ish projection matrices
    proj = np.zeros((b, N_CAMS, 4, 4), np.float32)
    for c in range(N_CAMS):
        intr = np.array([[50.0, 0, IMG_W / 2, 0],
                         [0, 50.0, IMG_H / 2, 0],
                         [0, 0, 1.0, 0],
                         [0, 0, 0, 1.0]], np.float32)
        ang = 2 * np.pi * c / N_CAMS
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [0, 0, -1],
             [np.sin(ang), np.cos(ang), 0]], np.float32)
        proj[:, c] = intr @ rot
    image_wh = np.full((b, N_CAMS, 2), (IMG_W, IMG_H), np.float32)
    xs = (np.arange(10) + 0.5) * 1.0 - 5.0
    zs = (np.arange(4) + 0.5) * 1.0 - 1.0
    occ_xyz = np.stack(np.meshgrid(xs, xs, zs, indexing="ij"),
                       axis=-1)[None].repeat(b, 0).astype(np.float32)
    occ_label = rng.randint(0, NUM_CLASSES, (b, 10, 10, 4)).astype(np.int32)
    occ_mask = (rng.rand(b, 10, 10, 4) > 0.3)
    return {
        "imgs": jnp.asarray(imgs),
        "projection_mat": jnp.asarray(proj),
        "image_wh": jnp.asarray(image_wh),
        "occ_xyz": jnp.asarray(occ_xyz),
        "occ_label": jnp.asarray(occ_label),
        "occ_cam_mask": jnp.asarray(occ_mask),
    }


@pytest.mark.parametrize("version", [2, 1])
def test_forward(version):
    model = tiny_segmentor(version)
    batch = make_batch(np.random.RandomState(0))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    out = jax.jit(model.apply, static_argnames=("training",))(
        variables,
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    n_vox = 10 * 10 * 4
    assert out["final_occ"].shape == (1, n_vox)
    assert out["pred_occ"][-1].shape == (1, n_vox, NUM_CLASSES)
    for x in out["pred_occ"]:
        assert np.all(np.isfinite(np.asarray(x)))
    if version == 2:
        assert out["bin_logits"][-1].shape == (1, n_vox)
        assert out["pixel_logits"] is not None


def test_train_step_v2():
    from gaussianformer_tpu.train.train_state import (
        TrainState, create_train_state)
    from gaussianformer_tpu.train.optim import build_optimizer
    from gaussianformer_tpu.losses.occupancy import (
        OccupancyLossCfg, occupancy_loss)
    from gaussianformer_tpu.losses.bce import pixel_distribution_loss
    from gaussianformer_tpu.losses.multi_loss import MultiLoss, LossTerm
    import functools

    model = tiny_segmentor(2)
    batch = make_batch(np.random.RandomState(1))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=True, rng=rng)

    occ_cfg = OccupancyLossCfg(
        num_classes=NUM_CLASSES, empty_label=5, lovasz_ignore=5,
        lovasz_use_softmax=False, balance_cls_weight=False)
    loss_fn = MultiLoss([
        LossTerm("occ", 1.0, functools.partial(occupancy_loss, occ_cfg),
                 ("pred_occ", "sampled_label", "occ_mask")),
        LossTerm("pix", 1.0,
                 functools.partial(pixel_distribution_loss,
                                   use_sigmoid=False),
                 ("pixel_logits", "pixel_gt")),
    ])

    tx, _ = build_optimizer(variables["params"], 1e-4, 100,
                            frozen_prefixes=())
    state = create_train_state(variables, tx)

    @jax.jit
    def grad_step(params, batch, rng):
        def compute_loss(params):
            out = model.apply(
                {"params": params, **{k: v for k, v in variables.items()
                                      if k != "params"}},
                batch["imgs"], batch["projection_mat"], batch["image_wh"],
                occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=True, rng=rng,
                rngs={"dropout": rng})
            loss, logs = loss_fn(out)
            return loss, logs

        return jax.value_and_grad(compute_loss, has_aux=True)(params)

    (loss, logs), grads = grad_step(state.params, batch, rng)
    assert np.isfinite(float(loss))
    new_state = state.apply_gradients(grads)
    # some parameter must have moved
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(jnp.subtract, new_state.params, state.params),
        0.0)
    assert diff > 0
