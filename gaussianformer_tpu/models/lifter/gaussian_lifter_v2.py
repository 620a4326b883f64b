"""GaussianLifterV2: distribution-based pixel-aligned anchor initialization.

Capability parity with reference model/lifter/gaussian_lifter_v2.py:16-322,
re-formulated with static shapes for TPU:

  - per-pixel depth distribution over ``num_samples`` bins (+1 "no
    occupancy along the ray" bin) from a separate ResNet+SECONDFPN;
  - unprojection is factored as ``x(d) = origin + d * dir`` so the full
    [pixels x bins x 3] tensor is never materialized for sampling — only
    the chunked ground-truth lookup walks the bins;
  - sampling is inverse-CDF (stochastic) or top-k (deterministic);
  - the reference's dynamic filter → pad → farthest-point-sampling
    pipeline becomes: mask invalid candidates, replace them with jittered
    copies of random valid candidates (the reference's padding, made
    static), then run masked FPS with a static candidate cap.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.safe_ops import safe_inverse_sigmoid
from ...ops.fps import farthest_point_sampling
from .initializer import ResNetSecondFPN
from .gaussian_lifter import _init_anchor


def sample_discrete_distribution(key, pdf, num_samples: int):
    """Inverse-CDF sampling (reference model/utils/sampler.py:7-22).

    pdf: [..., bucket]. Returns (index [..., num_samples], density)."""
    eps = jnp.finfo(jnp.float32).eps
    norm = pdf / (eps + jnp.sum(pdf, axis=-1, keepdims=True))
    cdf = jnp.cumsum(norm, axis=-1)
    bucket = pdf.shape[-1]
    u = jax.random.uniform(key, pdf.shape[:-1] + (num_samples,))
    # searchsorted(cdf, u, right=True) == #(cdf <= u)
    idx = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32),
                  axis=-1)
    idx = jnp.clip(idx, 0, bucket - 1)
    dens = jnp.take_along_axis(norm, idx, axis=-1)
    return idx, dens


def gather_discrete_topk(pdf, num_samples: int):
    eps = jnp.finfo(jnp.float32).eps
    norm = pdf / (eps + jnp.sum(pdf, axis=-1, keepdims=True))
    _, idx = jax.lax.top_k(pdf, num_samples)
    return idx, jnp.take_along_axis(norm, idx, axis=-1)


class GaussianLifterV2(nn.Module):
    num_anchor: int = 4000
    embed_dims: int = 128
    semantic_dim: int = 17
    include_opa: bool = True
    num_samples: int = 128
    depth_min: float = 1.0
    depth_max: float = 72.0
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    voxel_size: float = 0.5
    occ_resolution: Tuple[int, int, int] = (200, 200, 16)
    empty_label: int = 17
    anchors_per_pixel: int = 1
    deterministic_sampling: bool = False
    random_samples: int = 2400
    use_initializer: bool = True
    initializer_depth: int = 101
    initializer_dcn: tuple = (False, False, True, True)
    initializer_base_channels: int = 64
    initializer_out_channels: tuple = (128, 128, 128, 128)
    initializer_dtype: str = "float32"
    dcn_win: int = 24
    gt_bin_chunk: int = 16

    def _depth_bins(self):
        return jnp.linspace(self.depth_min, self.depth_max, self.num_samples)

    @nn.compact
    def __call__(self, imgs, projection_mat, image_wh, occ_label=None,
                 occ_cam_mask=None, secondfpn_out=None, *,
                 rng: Optional[jax.Array] = None,
                 compute_gt: bool = True,
                 fuse_dcn_epilogue: bool = False):
        """imgs: [B, N, H, W, 3]; projection_mat: [B, N, 4, 4] (lidar→img);
        occ_label: [B, X, Y, Z] int; occ_cam_mask: [B, X, Y, Z] bool."""
        b, n = imgs.shape[:2]
        if secondfpn_out is None:
            assert self.use_initializer
            feat = ResNetSecondFPN(
                depth=self.initializer_depth,
                stage_with_dcn=tuple(self.initializer_dcn),
                base_channels=self.initializer_base_channels,
                out_channels=tuple(self.initializer_out_channels),
                dtype=self.initializer_dtype,
                fuse_dcn_epilogue=fuse_dcn_epilogue,
                dcn_win=self.dcn_win,
                # remat only on the training path (fuse_dcn_epilogue is
                # the segmentor's not-training flag); at inference the
                # remat boundary blocks conv-epilogue fusion
                with_cp=not fuse_dcn_epilogue,
                name="initialize_backbone")(
                imgs.reshape((b * n,) + imgs.shape[2:]))
            secondfpn_out = feat.reshape((b, n) + feat.shape[1:])
        h, w = secondfpn_out.shape[2:4]

        # ---- per-pixel depth-occupancy distribution
        logits = nn.Dense(self.num_samples + 1, name="projection")(
            nn.relu(secondfpn_out))  # [B, N, h, w, S+1]

        # ---- ray geometry: x(d) = origin + d * dir   (img→lidar)
        inv_proj = jnp.linalg.inv(projection_mat)  # [B, N, 4, 4]
        u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        uv = jnp.stack(
            [jnp.broadcast_to(u[None, :], (h, w)),
             jnp.broadcast_to(v[:, None], (h, w))], axis=-1)  # [h, w, 2]
        uv = uv[None, None] * image_wh[:, :, None, None]  # [B, N, h, w, 2]
        uv1 = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        # dir = M[:3, :3] @ [u, v, 1]; origin = M[:3, 3]
        ray_dir = jnp.einsum("bnij,bnhwj->bnhwi", inv_proj[..., :3, :3], uv1)
        origin = inv_proj[..., :3, 3][:, :, None, None]  # [B, N, 1, 1, 3]

        depth_bins = self._depth_bins()
        pc_lo = jnp.asarray(self.pc_range[:3], jnp.float32)
        pc_hi = jnp.asarray(self.pc_range[3:6], jnp.float32)
        res = jnp.asarray(self.occ_resolution, jnp.int32)

        # ---- ground-truth occupancy along each ray (training only).
        # One fused linear-index computation + ONE packed gather per batch:
        # the earlier lax.map over bin chunks with per-axis 3-D lookups
        # cost ~840 ms/step on v5e (16.6M scalar gathers, twice, behind a
        # serialized scan); packing (occupied & visible) into a single
        # uint8 grid makes it ~one descriptor-bound pass.
        pixel_gt = None
        if compute_gt and occ_label is not None:
            gt_grid = ((occ_label != self.empty_label)
                       & occ_cam_mask).astype(jnp.uint8)
            gt_flat = gt_grid.reshape(b, -1)
            # per-axis voxel indices straight from the ray parametrization
            # (never materializes the [.., K, 3] points tensor)
            d = depth_bins  # [K]
            ix_parts = []
            oob = None
            for ax in range(3):
                coord = (origin[..., ax:ax + 1]
                         + ray_dir[..., ax:ax + 1] * d)   # [B,N,h,w,K]
                axi = ((coord - pc_lo[ax])
                       / self.voxel_size).astype(jnp.int32)
                # out-of-bounds is defined by pc_range (NOT the grid
                # extent — configs may use a coarser grid than the range)
                bad = (coord < pc_lo[ax]) | (coord >= pc_hi[ax])
                oob = bad if oob is None else (oob | bad)
                ix_parts.append(jnp.clip(axi, 0, res[ax] - 1))
            lin = ((ix_parts[0] * self.occ_resolution[1] + ix_parts[1])
                   * self.occ_resolution[2] + ix_parts[2])
            lin = lin.reshape(b, -1)
            gt = jnp.take_along_axis(gt_flat, lin, axis=1).reshape(
                b, n, h, w, self.num_samples)
            gt = (gt > 0) & ~oob
            pixel_gt = jnp.concatenate(
                [gt, ~jnp.any(gt, axis=-1, keepdims=True)], axis=-1)

        # ---- sample one depth bin per pixel
        pdfs = jax.nn.softmax(logits, axis=-1)
        if self.deterministic_sampling:
            index, _ = gather_discrete_topk(pdfs, self.anchors_per_pixel)
        else:
            assert rng is not None, "stochastic sampling needs an rng"
            rng, k_samp = jax.random.split(rng)
            index, _ = sample_discrete_distribution(
                k_samp, pdfs, self.anchors_per_pixel)
        disable = (jnp.argmax(pdfs, axis=-1, keepdims=True)
                   == self.num_samples)
        disable = jnp.broadcast_to(disable, index.shape)

        d_sel = depth_bins[jnp.clip(index, 0, self.num_samples - 1)]
        sampled = (origin[..., None, :]
                   + ray_dir[..., None, :] * d_sel[..., None])
        # [B, N, h, w, A, 3] → [B, cand, 3]
        cand = sampled.reshape(b, -1, 3)
        oob = jnp.any((cand < pc_lo) | (cand >= pc_hi), axis=-1)
        valid = ~disable.reshape(b, -1) & ~oob

        # ---- static replacement for the reference's pad-with-jitter:
        # each invalid slot takes a random valid candidate + N(0, 0.1).
        if rng is None:
            rng = self.make_rng("params") if self.has_rng("params") else \
                jax.random.PRNGKey(0)
        rng, k_pick, k_noise = jax.random.split(rng, 3)

        def pad_invalid(cand_i, valid_i, key):
            num_cand = cand_i.shape[0]
            k_pick_i, k_noise_i = jax.random.split(key)
            # stable list of valid slots via blocked prefix compaction
            # (a bool argsort of ~130k rows costs ~1 ms on v5e)
            from ...ops.compaction import compact_indices
            order_valid = compact_indices(valid_i, num_cand)
            count = jnp.maximum(jnp.sum(valid_i), 1)
            pick = jax.random.randint(
                k_pick_i, (num_cand,), 0, num_cand) % count
            repl = cand_i[order_valid[pick]]
            noise = jax.random.normal(k_noise_i, (num_cand, 3)) * 0.1
            repl = jnp.clip(repl + noise, pc_lo, pc_hi)
            return jnp.where(valid_i[:, None], cand_i, repl)

        keys = jax.random.split(k_pick, b)
        cand = jax.vmap(pad_invalid)(cand, valid, keys)

        # ---- farthest point sampling down to num_anchor (python loop
        # over the small static batch: the TPU path is a Pallas kernel,
        # which composes with jit but not with vmap)
        sel = jnp.stack([
            farthest_point_sampling(cand[i], self.num_anchor)
            for i in range(b)])
        anchor_xyz = jnp.take_along_axis(cand, sel[..., None], axis=1)

        unit = (anchor_xyz - pc_lo) / (pc_hi - pc_lo)
        xyz = safe_inverse_sigmoid(unit)

        # ---- learned non-xyz anchor params + fully-random anchors
        # (v2 stores only [scale, rot, opa, sem]; scale init is constant 0.5
        # pre-sigmoid, reference gaussian_lifter_v2.py:56-73)
        anchor_rest = self.param(
            "anchor", lambda key: _init_anchor(
                key, self.num_anchor, self.semantic_dim,
                self.include_opa)[:, 3:].at[:, :3].set(
                safe_inverse_sigmoid(0.5)))
        anchor = jnp.concatenate(
            [xyz, jnp.broadcast_to(anchor_rest[None],
                                   (b,) + anchor_rest.shape)], axis=-1)

        if self.random_samples > 0:
            random_anchors = self.param(
                "random_anchors",
                lambda key: _init_anchor(key, self.random_samples,
                                         self.semantic_dim,
                                         self.include_opa))
            anchor = jnp.concatenate(
                [anchor, jnp.broadcast_to(
                    random_anchors[None], (b,) + random_anchors.shape)],
                axis=1)

        total = self.num_anchor + self.random_samples
        instance_feature = self.param(
            "instance_feature", nn.initializers.zeros,
            (total, self.embed_dims))

        return {
            "representation": anchor,
            "rep_features": jnp.broadcast_to(
                instance_feature[None], (b,) + instance_feature.shape),
            "pixel_logits": logits,
            "pixel_gt": pixel_gt,
        }
