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
    # NOTE: a channel-stacked "paired towers" trunk (one grouped conv /
    # one Pallas DCN grid per block pair) was implemented, measured 23 ms
    # SLOWER on v5e (263 vs 240 ms device — XLA's grouped-conv lowering
    # does not fuse the BN/ReLU/residual epilogues), and removed; the
    # implementation is preserved in git history (commit 83a0992,
    # removed after round 4). See docs/PERF.md round-4 notes.

    @nn.compact
    def __call__(self, imgs, projection_mat, image_wh,
                 occ_xyz=None, occ_label=None, occ_cam_mask=None,
                 anchor_points=None, *,
                 training: bool = False, rng: Optional[jax.Array] = None,
                 rep_only: bool = False, occ_only: bool = False,
                 apply_loss_layers: Optional[Sequence[int]] = None
                 ) -> Dict[str, Any]:
        """imgs: [B, N_cam, H, W, 3] normalized images (NHWC).

        projection_mat: [B, N_cam, 4, 4] lidar→image; image_wh [B, N_cam, 2].
        occ_*: voxel ground truth (needed for head sampling / losses).
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
                fuse_dcn_epilogue=not training)

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
