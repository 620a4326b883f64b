"""Iterative Gaussian refinement decoder.

Op-order-driven block stack (reference
model/encoder/gaussian_encoder/gaussian_encoder.py:28-123): each entry in
``operation_order`` dispatches to one of
{identity, add, norm, ffn, deformable, spconv, refine}; after every refine
(except the last) the anchor is re-embedded.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from .modules import (
    AsymmetricFFN,
    DeformableFeatureAggregation,
    GaussianPrediction,
    SparseConv3DModule,
    SparseGaussian3DEncoder,
    SparseGaussian3DRefinementModule,
    SparseGaussian3DRefinementModuleV2,
)


class GaussianOccEncoder(nn.Module):
    operation_order: Tuple[str, ...]
    embed_dims: int = 128
    include_opa: bool = True
    semantic_dim: int = 17
    # ffn
    ffn_cfg: dict = None
    # deformable
    deformable_cfg: dict = None
    # refine
    refine_cfg: dict = None
    refine_version: int = 2
    # spconv
    spconv_cfg: dict = None

    @nn.compact
    def __call__(self, representation, rep_features, ms_img_feats,
                 projection_mat, image_wh, deterministic: bool = True):
        anchor = representation
        instance_feature = rep_features

        # Pick the deformable backend once: the fused Pallas kernel on
        # TPU (raw per-level maps; ops/pallas/deformable_kernel.py), the
        # chunked XLA gather elsewhere — for which the multi-level maps
        # are packed ONCE for all deformable ops (the reference likewise
        # hoists feature_maps_format, ops/deformable_aggregation.py:80-117)
        import jax as _jax
        deform_cfg = dict(self.deformable_cfg or {})
        backend = deform_cfg.pop("backend", "auto")
        if backend == "auto":
            fused_ok = (len(ms_img_feats) == 4
                        and deform_cfg.get("num_groups", 4) == 4)
            backend = ("fused" if fused_ok
                       and _jax.default_backend() not in ("cpu",)
                       else "xla")
        deform_cfg["backend"] = backend
        if backend == "fused":
            from ...ops.deformable import prepack_feature_maps_cm
            packed_feats = prepack_feature_maps_cm(ms_img_feats)
        else:
            from ...ops.deformable import pack_feature_maps
            packed_feats = pack_feature_maps(ms_img_feats)

        anchor_encoder = SparseGaussian3DEncoder(
            embed_dims=self.embed_dims,
            include_opa=self.include_opa,
            semantic_dim=self.semantic_dim,
            name="anchor_encoder")
        anchor_embed = anchor_encoder(anchor)

        refine_cls = (SparseGaussian3DRefinementModuleV2
                      if self.refine_version == 2
                      else SparseGaussian3DRefinementModule)

        predictions = []
        identity = None
        for i, op in enumerate(self.operation_order):
            if op == "identity":
                identity = instance_feature
            elif op == "add":
                instance_feature = instance_feature + identity
            elif op == "norm":
                instance_feature = nn.LayerNorm(
                    epsilon=1e-5, name=f"op{i}_norm")(instance_feature)
            elif op == "ffn":
                instance_feature = AsymmetricFFN(
                    **(self.ffn_cfg or {}), name=f"op{i}_ffn")(
                    instance_feature, deterministic=deterministic)
            elif op == "deformable":
                instance_feature = DeformableFeatureAggregation(
                    **deform_cfg, name=f"op{i}_deformable")(
                    instance_feature, anchor, anchor_embed, packed_feats,
                    projection_mat, image_wh, deterministic=deterministic)
            elif op == "spconv":
                instance_feature = SparseConv3DModule(
                    **(self.spconv_cfg or {}), name=f"op{i}_spconv")(
                    instance_feature, anchor,
                    deterministic=deterministic)
            elif "refine" in op:
                anchor, gaussian = refine_cls(
                    **(self.refine_cfg or {}), name=f"op{i}_refine")(
                    instance_feature, anchor, anchor_embed)
                predictions.append(gaussian)
                if i != len(self.operation_order) - 1:
                    anchor_embed = anchor_encoder(anchor)
            else:
                raise NotImplementedError(f"op {op!r} is not supported")

        return {"representation": predictions, "final_anchor": anchor,
                "features": instance_feature}
