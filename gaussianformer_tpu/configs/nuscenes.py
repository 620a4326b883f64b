"""Typed configs for the shipped model variants.

One dataclass replaces the reference's mmengine python-config inheritance
(config/_base_/* composed by config/*.py). The five named configs mirror
the reference model zoo exactly:

  - ``gs144000``        GaussianFormer baseline, 144000 anchors
                        (reference config/nuscenes_gs144000.py)
  - ``gs25600_solid``   GaussianFormer NonEmpty, 25600 anchors, with_empty
                        (reference config/nuscenes_gs25600_solid.py)
  - ``prob_gs6400``     GaussianFormer-2 Prob-64 (4000 sampled + 2400 random)
                        (reference config/prob/nuscenes_gs6400.py)
  - ``prob_gs12800``    GaussianFormer-2 Prob-128
  - ``prob_gs25600``    GaussianFormer-2 Prob-256
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from ..ops.splat import SplatGridSpec

PC_RANGE = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)

NUSC_CLASS_NAMES = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]

# manual 18-class CE weights (reference config/nuscenes_gs144000.py:53-56)
MANUAL_CLASS_WEIGHT = (
    1.01552756, 1.06897009, 1.30013094, 1.07253735, 0.94637502, 1.10087012,
    1.26960524, 1.06258364, 1.189019, 1.06217292, 1.00595144, 0.85706115,
    1.03923299, 0.90867526, 0.8936431, 0.85486129, 0.8527829, 0.5,
)

FIX_SCALE = (
    (0.0, 0.0, 0.0),
    (0.45, 0.0, 0.0), (-0.45, 0.0, 0.0),
    (0.0, 0.45, 0.0), (0.0, -0.45, 0.0),
    (0.0, 0.0, 0.45), (0.0, 0.0, -0.45),
)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-4
    weight_decay: float = 0.01
    backbone_lr_mult: float = 0.1
    grad_max_norm: float = 35.0
    warmup_iters: int = 500
    min_lr_ratio: float = 0.1
    max_epochs: int = 20


@dataclasses.dataclass(frozen=True)
class DataConfig:
    input_size: Tuple[int, int] = (864, 1600)   # (H, W)
    num_cams: int = 6
    batch_size: int = 1
    resize_lim: Tuple[float, float] = (1.0, 1.0)
    rot_lim: Tuple[float, float] = (0.0, 0.0)
    rand_flip: bool = True
    img_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    to_rgb: bool = True


@dataclasses.dataclass(frozen=True)
class GaussianFormerConfig:
    name: str
    version: int                      # 1 or 2
    embed_dims: int = 128
    num_decoder: int = 4
    semantic_dim: int = 17
    num_classes: int = 18
    include_opa: bool = True
    pc_range: Tuple[float, ...] = PC_RANGE
    scale_range: Tuple[float, float] = (0.01, 3.2)
    # lifter
    num_anchor: int = 4000
    random_samples: int = 2400
    num_depth_samples: int = 128
    freeze_lifter: bool = False
    # encoder
    num_learnable_pts: int = 6
    learnable_fixed_scale: float = 6.0
    fix_scale: Tuple[Tuple[float, float, float], ...] = ((0.0, 0.0, 0.0),)
    unit_xyz: Tuple[float, float, float] = (4.0, 4.0, 1.0)
    restrict_xyz: bool = False
    refine_manual: Optional[Tuple[int, ...]] = None
    semantics_activation: str = "identity"
    spconv_grid_size: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    spconv_use_out_proj: bool = True
    spconv_use_multi_layer: bool = True
    ffn_pre_norm: bool = False
    ffn_add_identity: bool = False
    ffn_in_channels: Optional[int] = None
    deformable_residual_mode: str = "none"
    attn_drop: float = 0.15
    # deformable backend: "auto" (fused Pallas kernel on TPU, XLA gather
    # elsewhere), "fused", or "xla"
    deformable_backend: str = "auto"
    # Pallas DCN sampling window (both towers). Samples beyond
    # ±(dcn_win-11)/2 feature px of their tap are dropped; widen (in
    # multiples of 8) if utils.check_dcn_offset_margin flags a
    # checkpoint whose learned offsets exceed that margin.
    dcn_win: int = 24

    ffn_drop: float = 0.1
    # head
    apply_loss_type: str = "random_1"
    with_empty: bool = False
    use_localaggprob: bool = True
    use_localaggprob_fast: bool = False
    combine_geosem: bool = True
    empty_mean: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    empty_scale: Tuple[float, float, float] = (100.0, 100.0, 8.0)
    scale_multiplier: float = 4.0
    # loss
    ce_weight: float = 10.0
    lovasz_weight: float = 1.0
    lovasz_use_softmax: bool = False
    use_pixel_distribution_loss: bool = True
    # misc
    optim: OptimConfig = OptimConfig()
    data: DataConfig = DataConfig()
    empty_label: int = 17
    compute_dtype: str = "bfloat16"   # backbone/neck compute precision

    @property
    def total_anchors(self) -> int:
        return self.num_anchor + self.random_samples

    @property
    def operation_order(self) -> Tuple[str, ...]:
        if self.version == 2:
            block = (
                "identity", "deformable", "add", "norm",
                "identity", "ffn", "add", "norm",
                "identity", "spconv", "add", "norm",
                "identity", "ffn", "add", "norm",
                "refine",
            )
            return block * self.num_decoder
        first = ("deformable", "ffn", "norm", "refine")
        rest = ("spconv", "norm", "deformable", "ffn", "norm", "refine")
        return first + rest * (self.num_decoder - 1)

    def splat_grid(self) -> SplatGridSpec:
        return SplatGridSpec(
            H=200, W=200, D=16, pc_min=self.pc_range[:3], grid_size=0.5,
            scale_multiplier=self.scale_multiplier)

    # ---- module config dicts ------------------------------------------
    def backbone_cfg(self) -> dict:
        return dict(depth=101, out_indices=(0, 1, 2, 3), style="caffe",
                    stage_with_dcn=(False, False, True, True), with_cp=True,
                    dtype=self.compute_dtype, dcn_win=self.dcn_win)

    def neck_cfg(self) -> dict:
        return dict(out_channels=self.embed_dims, num_outs=4, start_level=1,
                    add_extra_convs="on_output",
                    relu_before_extra_convs=True,
                    dtype=self.compute_dtype)

    def lifter_cfg(self) -> dict:
        if self.version == 1:
            return dict(num_anchor=self.num_anchor,
                        embed_dims=self.embed_dims,
                        semantic_dim=self.semantic_dim,
                        include_opa=self.include_opa)
        return dict(num_anchor=self.num_anchor,
                    embed_dims=self.embed_dims,
                    semantic_dim=self.semantic_dim,
                    include_opa=self.include_opa,
                    num_samples=self.num_depth_samples,
                    pc_range=self.pc_range,
                    random_samples=self.random_samples,
                    empty_label=self.empty_label,
                    initializer_dtype=self.compute_dtype,
                    dcn_win=self.dcn_win)

    def encoder_cfg(self) -> dict:
        refine_cfg = dict(
            embed_dims=self.embed_dims,
            pc_range=self.pc_range,
            scale_range=self.scale_range,
            unit_xyz=self.unit_xyz,
            semantic_dim=self.semantic_dim,
            include_opa=self.include_opa,
            semantics_activation=self.semantics_activation,
        )
        if self.version == 1:
            refine_cfg.update(restrict_xyz=self.restrict_xyz,
                              refine_manual=self.refine_manual)
        return dict(
            operation_order=self.operation_order,
            embed_dims=self.embed_dims,
            include_opa=self.include_opa,
            semantic_dim=self.semantic_dim,
            refine_version=self.version,
            refine_cfg=refine_cfg,
            ffn_cfg=dict(
                embed_dims=self.embed_dims,
                feedforward_channels=self.embed_dims * 4,
                ffn_drop=self.ffn_drop,
                pre_norm=self.ffn_pre_norm,
                add_identity=self.ffn_add_identity,
                in_channels=self.ffn_in_channels,
            ),
            deformable_cfg=dict(
                embed_dims=self.embed_dims,
                num_groups=4,
                num_levels=4,
                num_cams=self.data.num_cams,
                attn_drop=self.attn_drop,
                backend=self.deformable_backend,
                use_camera_embed=True,
                residual_mode=self.deformable_residual_mode,
                num_learnable_pts=self.num_learnable_pts,
                learnable_fixed_scale=self.learnable_fixed_scale,
                fix_scale=self.fix_scale,
                pc_range=self.pc_range,
                scale_range=self.scale_range,
            ),
            spconv_cfg=dict(
                in_channels=self.embed_dims,
                embed_channels=self.embed_dims,
                pc_range=self.pc_range,
                grid_size=self.spconv_grid_size,
                use_out_proj=self.spconv_use_out_proj,
                use_multi_layer=self.spconv_use_multi_layer,
            ),
        )

    def head_cfg(self) -> dict:
        return dict(
            apply_loss_type=self.apply_loss_type,
            num_classes=self.num_classes,
            empty_label=self.empty_label,
            with_empty=self.with_empty,
            empty_mean=self.empty_mean,
            empty_scale=self.empty_scale,
            use_localaggprob=self.use_localaggprob,
            combine_geosem=self.combine_geosem,
            grid=self.splat_grid(),
            per_axis_radii=self.use_localaggprob_fast,
        )

    def segmentor_cfg(self) -> dict:
        return dict(
            backbone_cfg=self.backbone_cfg(),
            neck_cfg=self.neck_cfg(),
            lifter_type="v1" if self.version == 1 else "v2",
            lifter_cfg=self.lifter_cfg(),
            encoder_cfg=self.encoder_cfg(),
            head_cfg=self.head_cfg(),
        )


def _prob_config(name, num_anchor, random_samples, scale_range,
                 scale_multiplier, unit_xyz=(4.0, 4.0, 1.0)):
    return GaussianFormerConfig(
        name=name, version=2,
        num_anchor=num_anchor, random_samples=random_samples,
        scale_range=scale_range, scale_multiplier=scale_multiplier,
        unit_xyz=unit_xyz,
        freeze_lifter=True,
        optim=OptimConfig(lr=4e-4),
    )


_CONFIGS = {
    # reference config/prob/nuscenes_gs6400.py
    "prob_gs6400": _prob_config(
        "prob_gs6400", 4000, 2400, (0.01, 3.2), 4.0),
    # reference config/prob/nuscenes_gs12800.py
    "prob_gs12800": _prob_config(
        "prob_gs12800", 6400, 6400, (0.01, 2.5), 5.0),
    # reference config/prob/nuscenes_gs25600.py
    "prob_gs25600": _prob_config(
        "prob_gs25600", 19200, 6400, (0.01, 1.8), 4.0),
    # reference config/nuscenes_gs144000.py
    "gs144000": GaussianFormerConfig(
        name="gs144000", version=1,
        num_anchor=144000, random_samples=0,
        semantic_dim=18, num_classes=18, include_opa=False,
        scale_range=(0.08, 0.32), scale_multiplier=3.0,
        num_learnable_pts=2, learnable_fixed_scale=1.0,
        unit_xyz=(2.0, 2.0, 0.5), restrict_xyz=True,
        refine_manual=(0, 1, 2),
        semantics_activation="identity",
        spconv_grid_size=(0.5, 0.5, 0.5),
        spconv_use_out_proj=False, spconv_use_multi_layer=False,
        ffn_add_identity=True, ffn_in_channels=256,
        deformable_residual_mode="cat",
        apply_loss_type="all",
        use_localaggprob=False, combine_geosem=False,
        lovasz_use_softmax=True, use_pixel_distribution_loss=False,
    ),
    # reference config/nuscenes_gs25600_solid.py
    "gs25600_solid": GaussianFormerConfig(
        name="gs25600_solid", version=1,
        num_anchor=25600, random_samples=0,
        semantic_dim=17, num_classes=18, include_opa=True,
        scale_range=(0.08, 0.64), scale_multiplier=3.0,
        num_learnable_pts=2, learnable_fixed_scale=1.0,
        unit_xyz=(4.0, 4.0, 1.0), restrict_xyz=True,
        refine_manual=(0, 1, 2),
        semantics_activation="softplus",
        spconv_grid_size=(0.5, 0.5, 0.5),
        spconv_use_out_proj=True, spconv_use_multi_layer=False,
        ffn_add_identity=True, ffn_in_channels=256,
        deformable_residual_mode="cat",
        apply_loss_type="random_1",
        with_empty=True,
        use_localaggprob=False, combine_geosem=False,
        lovasz_use_softmax=True, use_pixel_distribution_loss=False,
    ),
}


def get_config(name: str) -> GaussianFormerConfig:
    return _CONFIGS[name]


def list_configs():
    return sorted(_CONFIGS)
