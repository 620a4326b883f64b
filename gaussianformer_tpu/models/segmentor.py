"""Top-level segmentor: images → multi-scale features → lifter → encoder →
head (capability parity with reference model/segmentor/bev_segmentor.py).

The module is a pure function of (params, batch); freezing
(freeze_img_backbone / freeze_lifter / ...) is applied in the optimizer
partition, matching the reference's requires_grad_ flags.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbone.resnet import ResNet
from .neck.fpn import FPN
from .lifter.gaussian_lifter import GaussianLifter
from .lifter.gaussian_lifter_v2 import GaussianLifterV2
from .encoder.gaussian_encoder import GaussianOccEncoder
from .head.gaussian_head import GaussianHead


class BEVSegmentor(nn.Module):
    backbone_cfg: dict = None
    neck_cfg: dict = None
    lifter_type: str = "v2"          # "v1" | "v2"
    lifter_cfg: dict = None
    encoder_cfg: dict = None
    head_cfg: dict = None
    img_backbone_out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # run the main backbone and the lifter-v2 initializer trunk
    # channel-stacked through one op sequence (models/backbone/paired.py):
    # one grouped conv / one Pallas DCN grid per block pair instead of
    # two. MEASURED OFF by default on v5e: XLA's feature_group_count=2
    # lowering refuses to fuse the BN/ReLU/residual epilogues that the
    # per-tower convs absorb (~16 ms/frame of bare elementwise) and the
    # paired DCN kernel is compute-bound (51 ms either way) — the paired
    # graph traced 263 vs 240 ms device (docs/PERF.md round-4 notes).
    # Kept as an option: the trunk math + grads are test-verified, and
    # the trade may flip on other topologies/compilers.
    pair_towers: bool = False

    def _can_pair(self) -> bool:
        if self.lifter_type != "v2":
            return False
        bb = dict(self.backbone_cfg or {})
        lc = dict(self.lifter_cfg or {})
        if not lc.get("use_initializer", True):
            return False
        same = (
            bb.get("depth", 101) == lc.get("initializer_depth", 101)
            and tuple(bb.get("stage_with_dcn",
                             (False, False, False, False)))
            == tuple(lc.get("initializer_dcn",
                            (False, False, True, True)))
            and bb.get("base_channels", 64)
            == lc.get("initializer_base_channels", 64)
            and bb.get("style", "caffe") == "caffe"
            and jnp.dtype(bb.get("dtype", jnp.float32))
            == jnp.dtype(lc.get("initializer_dtype", "float32"))
            and bb.get("strides", (1, 2, 2, 2)) == (1, 2, 2, 2)
            and bb.get("dilations", (1, 1, 1, 1)) == (1, 1, 1, 1)
            and tuple(bb.get("out_indices", (0, 1, 2, 3)))
            == (0, 1, 2, 3)
            and bb.get("num_stages", 4) == 4)
        if not same:
            return False
        from .backbone.resnet import ARCH_SETTINGS
        return ARCH_SETTINGS[bb.get("depth", 101)][0] == "bottleneck"

    @nn.compact
    def __call__(self, imgs, projection_mat, image_wh,
                 occ_xyz=None, occ_label=None, occ_cam_mask=None,
                 anchor_points=None, *,
                 training: bool = False, rng: Optional[jax.Array] = None,
                 rep_only: bool = False, occ_only: bool = False,
                 apply_loss_layers: Optional[Sequence[int]] = None,
                 pair_towers: Optional[bool] = None
                 ) -> Dict[str, Any]:
        """imgs: [B, N_cam, H, W, 3] normalized images (NHWC).

        projection_mat: [B, N_cam, 4, 4] lidar→image; image_wh [B, N_cam, 2].
        occ_*: voxel ground truth (needed for head sampling / losses).
        ``pair_towers``: override the module default (e.g. the DCN
        offset-margin check needs the unpaired path for its sows).
        """
        b, n = imgs.shape[:2]

        # ---- image feature extraction (bev_segmentor.py:40-69)
        flat = imgs.reshape((b * n,) + imgs.shape[2:])
        backbone_cfg = dict(self.backbone_cfg or {})
        neck_cfg = dict(self.neck_cfg or {})
        if "dtype" in backbone_cfg:
            backbone_cfg["dtype"] = jnp.dtype(backbone_cfg["dtype"])
        if "dtype" in neck_cfg:
            neck_cfg["dtype"] = jnp.dtype(neck_cfg["dtype"])
        # inference: fold each DCN block's bn2+relu into the Pallas
        # kernel epilogue (forward-only fast path), and drop the stage
        # rematerialization (no grads to save memory for — the remat
        # call boundary also keeps XLA from fusing the residual
        # add+relu epilogues into the stage convs)
        backbone_cfg.setdefault("fuse_dcn_epilogue", not training)
        backbone_cfg["with_cp"] = (backbone_cfg.get("with_cp", False)
                                   and training)

        paired = (self.pair_towers if pair_towers is None else pair_towers)
        paired = (paired and not self.is_initializing()
                  and self._can_pair())
        init_trunk_feats = None
        if paired:
            from .backbone.paired import paired_resnet_apply
            pv = self.variables["params"]
            sv = self.variables["batch_stats"]
            pb_tree = pv["lifter"]["initialize_backbone"]["img_backbone"]
            sb_tree = sv["lifter"]["initialize_backbone"]["img_backbone"]
            feats_a, init_trunk_feats = paired_resnet_apply(
                pv["img_backbone"], sv["img_backbone"],
                pb_tree, sb_tree, flat,
                depth=backbone_cfg.get("depth", 101),
                stage_with_dcn=tuple(backbone_cfg.get(
                    "stage_with_dcn", (False, False, False, False))),
                style="caffe",
                base_channels=backbone_cfg.get("base_channels", 64),
                dtype=backbone_cfg.get("dtype", jnp.float32),
                dcn_win=backbone_cfg.get("dcn_win", 24),
                fuse_dcn_epilogue=backbone_cfg.get(
                    "fuse_dcn_epilogue", not training),
                with_cp=backbone_cfg.get("with_cp", False) and training)
            stage_feats = feats_a
        else:
            stage_feats = ResNet(**backbone_cfg, name="img_backbone")(flat)
        stage_feats = [stage_feats[i] for i in self.img_backbone_out_indices]
        ms_feats = FPN(**neck_cfg, name="img_neck")(stage_feats)
        ms_img_feats = [
            f.reshape((b, n) + f.shape[1:]) for f in ms_feats
        ]

        # ---- lifter
        rng_lifter = rng_head = None
        if rng is not None:
            rng_lifter, rng_head = jax.random.split(rng)
        if self.lifter_type == "v1":
            lifter_out = GaussianLifter(
                **(self.lifter_cfg or {}), name="lifter")(
                batch_size=b, anchor_points=anchor_points)
        else:
            lifter_out = GaussianLifterV2(
                **(self.lifter_cfg or {}), name="lifter")(
                imgs, projection_mat, image_wh,
                occ_label=occ_label, occ_cam_mask=occ_cam_mask,
                rng=rng_lifter, compute_gt=training,
                fuse_dcn_epilogue=not training,
                trunk_feats=init_trunk_feats)

        # ---- iterative refinement
        enc_out = GaussianOccEncoder(
            **(self.encoder_cfg or {}), name="encoder")(
            lifter_out["representation"], lifter_out["rep_features"],
            ms_img_feats, projection_mat, image_wh,
            deterministic=not training)
        if rep_only:
            return {"representation": enc_out["representation"]}

        # ---- splat head
        head_out = GaussianHead(
            **(self.head_cfg or {}), name="head")(
            enc_out["representation"], occ_xyz, occ_label, occ_cam_mask,
            training=training, rng=rng_head,
            apply_loss_layers=apply_loss_layers)

        if occ_only:
            # deployment shape (reference bev_segmentor.py:122-123)
            return {"final_occ": head_out["final_occ"]}
        result = dict(head_out)
        result["pixel_logits"] = lifter_out.get("pixel_logits")
        result["pixel_gt"] = lifter_out.get("pixel_gt")
        return result
