"""Encoder building blocks: anchor embedding, FFN, deformable cross-attn,
sparse-conv self-encoding, refinement (v1/v2).

Anchor vector layout (shared with the reference,
model/lifter/gaussian_lifter.py:52):
    [xyz(3), scale(3), rot quat(4), opacity(0|1), semantics(C_sem)]
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.safe_ops import safe_sigmoid
from ...ops.coords import cartesian, reverse_cartesian, spherical_to_cartesian
from ...ops.rotation import quaternion_to_rotation_matrix
from ...ops.deformable import deformable_aggregation
from ...ops.sparse_conv import submanifold_conv3d, voxel_indices
from ..layers import LinearReluLn, ChannelScale


class GaussianPrediction(NamedTuple):
    """Per-refine-layer decoded Gaussians (world space)."""
    means: jax.Array       # [B, P, 3]
    scales: jax.Array      # [B, P, 3]
    rotations: jax.Array   # [B, P, 4]
    opacities: jax.Array   # [B, P, 0|1]
    semantics: jax.Array   # [B, P, C_sem]
    original_means: Optional[jax.Array] = None
    delta_means: Optional[jax.Array] = None


class SparseGaussian3DEncoder(nn.Module):
    """Anchor → embedding: per-component MLPs summed then projected
    (reference anchor_encoder_module.py:8-53)."""
    embed_dims: int = 128
    include_opa: bool = True
    semantic_dim: int = 17

    @nn.compact
    def __call__(self, anchor):
        def embed(x, input_dims, name):
            return LinearReluLn(self.embed_dims, 1, 2, input_dims,
                                name=name)(x)

        out = embed(anchor[..., 0:3], 3, "xyz_fc")
        out = out + embed(anchor[..., 3:6], 3, "scale_fc")
        out = out + embed(anchor[..., 6:10], 4, "rot_fc")
        start = 10
        if self.include_opa:
            out = out + embed(anchor[..., 10:11], 1, "opacity_fc")
            start = 11
        if self.semantic_dim > 0:
            out = out + embed(
                anchor[..., start:start + self.semantic_dim],
                self.semantic_dim, "semantics_fc")
        return LinearReluLn(self.embed_dims, 1, 2, name="output_fc")(out)


class AsymmetricFFN(nn.Module):
    """2-layer FFN with optional pre-norm and identity projection
    (reference ffn_module.py:8-75)."""
    embed_dims: int = 128
    feedforward_channels: int = 512
    ffn_drop: float = 0.1
    pre_norm: bool = False
    add_identity: bool = True
    in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        identity = x
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(x)
            identity = x
        out = nn.Dense(self.feedforward_channels, name="fc1")(x)
        out = nn.relu(out)
        out = nn.Dropout(self.ffn_drop, deterministic=deterministic)(out)
        out = nn.Dense(self.embed_dims, name="fc2")(out)
        out = nn.Dropout(self.ffn_drop, deterministic=deterministic)(out)
        if not self.add_identity:
            return out
        in_ch = self.in_channels or self.embed_dims
        if in_ch != self.embed_dims:
            identity = nn.Dense(self.embed_dims, name="identity_fc")(identity)
        return identity + out


class SparseGaussian3DKeyPointsGenerator(nn.Module):
    """Key points = mean + R^T (fixed ∪ learnable offsets × gaussian scale)
    (reference deformable_module.py:18-90)."""
    embed_dims: int = 128
    num_learnable_pts: int = 0
    learnable_fixed_scale: float = 1.0
    fix_scale: Tuple[Tuple[float, float, float], ...] = ((0.0, 0.0, 0.0),)
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    scale_range: Tuple[float, float] = (0.01, 3.2)
    xyz_coordinate: str = "cartesian"    # "cartesian" | "polar"
    phi_activation: str = "sigmoid"      # "sigmoid" | "loop" (polar only)

    @property
    def num_pts(self):
        return len(self.fix_scale) + self.num_learnable_pts

    @nn.compact
    def __call__(self, anchor, instance_feature=None, learn_only=False):
        b, p = anchor.shape[:2]
        fix = jnp.asarray(self.fix_scale, jnp.float32)
        scale = jnp.broadcast_to(fix[None, None],
                                 (b, p, fix.shape[0], 3))
        learn_raw = None
        if self.num_learnable_pts > 0 and instance_feature is not None:
            learn_raw = nn.Dense(self.num_learnable_pts * 3,
                                 name="learnable_fc")(instance_feature)
        if learn_only:
            # SoA fast path (keypoints_projection_soa) consumes the raw
            # Dense output; only the params need creating here
            return learn_raw
        if learn_raw is not None:
            learn = safe_sigmoid(
                learn_raw.reshape(b, p, self.num_learnable_pts, 3)) - 0.5
            scale = jnp.concatenate(
                [scale, learn * self.learnable_fixed_scale], axis=-2)

        gs_scales = safe_sigmoid(anchor[..., None, 3:6])
        gs_scales = (self.scale_range[0]
                     + (self.scale_range[1] - self.scale_range[0]) * gs_scales)
        key_points = scale * gs_scales  # [B, P, num_pts, 3]

        rot_t = jnp.swapaxes(
            quaternion_to_rotation_matrix(anchor[..., 6:10]), -1, -2)
        key_points = jnp.einsum("bpij,bpkj->bpki", rot_t, key_points)

        if self.xyz_coordinate == "polar":
            xyz = spherical_to_cartesian(anchor, self.pc_range,
                                         self.phi_activation)
        else:
            xyz = cartesian(anchor[..., :3], self.pc_range)
        return key_points + xyz[:, :, None, :]


def keypoints_projection_soa(anchor, learn, fix_scale, learnable_fixed_scale,
                             scale_range, pc_range, projection_mat,
                             image_wh):
    """Key-point generation + camera projection in structure-of-arrays
    form: coordinates are carried as [B, K, P] planes (P on lanes)
    instead of [B, P, K, 3] — the AoS form's minor-3 rotation matrices
    and projection einsums each lower to tile-padded relayouts costing
    ~9 ms/frame at flagship size, while this SoA chain is a handful of
    full-lane elementwise fusions. Same math as
    SparseGaussian3DKeyPointsGenerator + project_points (cartesian path;
    reference deformable_module.py:18-90, :287-305).

    anchor: [B, P, 11+]; learn: [B, P, num_learnable*3] raw Dense output
    (or None); projection_mat [B, C, 4, 4]; image_wh [B, C, 2].
    Returns (u, v, mask) each [B, C, P, K] (normalized coords).
    """
    b, p = anchor.shape[:2]
    nf = len(fix_scale)

    # unit-quaternion rotation entries as [B, 1, P] planes
    qw, qx, qy, qz = (anchor[..., 6], anchor[..., 7],
                      anchor[..., 8], anchor[..., 9])
    qn = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qs = 1.0 / jnp.maximum(qn, 1e-12)
    qw, qx, qy, qz = qw * qs, qx * qs, qy * qs, qz * qs
    ww, xx, yy, zz = qw * qw, qx * qx, qy * qy, qz * qz
    wx_, wy_, wz_ = qw * qx, qw * qy, qw * qz
    xy_, xz_, yz_ = qx * qy, qx * qz, qy * qz
    r = {
        (0, 0): ww + xx - yy - zz, (0, 1): 2 * (xy_ - wz_),
        (0, 2): 2 * (xz_ + wy_),
        (1, 0): 2 * (xy_ + wz_), (1, 1): ww - xx + yy - zz,
        (1, 2): 2 * (yz_ - wx_),
        (2, 0): 2 * (xz_ - wy_), (2, 1): 2 * (yz_ + wx_),
        (2, 2): ww - xx - yy + zz,
    }
    r = {k: v[:, None, :] for k, v in r.items()}

    # per-axis gaussian scales [B, 1, P]
    lo3 = jnp.asarray(pc_range[:3], jnp.float32)
    hi3 = jnp.asarray(pc_range[3:6], jnp.float32)
    s_ax = []
    x_ax = []
    for ax in range(3):
        s = safe_sigmoid(anchor[..., 3 + ax])
        s_ax.append((scale_range[0]
                     + (scale_range[1] - scale_range[0]) * s)[:, None, :])
        x_ax.append((safe_sigmoid(anchor[..., ax])
                     * (hi3[ax] - lo3[ax]) + lo3[ax])[:, None, :])

    # offsets [B, K, P] per axis: fixed rows are constants, learnable
    # rows come from the Dense output
    fix = np.asarray(fix_scale, np.float32)      # [nf, 3]
    offs = []
    for ax in range(3):
        o_fix = jnp.broadcast_to(
            jnp.asarray(fix[:, ax])[None, :, None], (b, nf, p))
        if learn is not None:
            o_l = (safe_sigmoid(learn[..., ax::3]) - 0.5) \
                * learnable_fixed_scale            # [B, P, nl]
            o_l = jnp.swapaxes(o_l, 1, 2)          # [B, nl, P]
            offs.append(jnp.concatenate([o_fix, o_l], axis=1))
        else:
            offs.append(o_fix)

    v0 = offs[0] * s_ax[0]
    v1 = offs[1] * s_ax[1]
    v2 = offs[2] * s_ax[2]
    # world key points: R^T v + xyz, [B, K, P]
    kx = r[(0, 0)] * v0 + r[(1, 0)] * v1 + r[(2, 0)] * v2 + x_ax[0]
    ky = r[(0, 1)] * v0 + r[(1, 1)] * v1 + r[(2, 1)] * v2 + x_ax[1]
    kz = r[(0, 2)] * v0 + r[(1, 2)] * v1 + r[(2, 2)] * v2 + x_ax[2]
    # materialize: without the barrier XLA re-fuses this whole chain —
    # including the strided learnable-offset slices, which it lowers as
    # gathers — into each of the ~100 downstream per-plane fusions
    # (~9 ms/frame of recomputation at flagship size)
    kx, ky, kz = jax.lax.optimization_barrier((kx, ky, kz))

    # projection, vectorized over cams: [B, C, 1, 1] x [B, 1, K, P]
    def pm(i, j):
        return projection_mat[:, :, i, j][..., None, None]

    kx, ky, kz = kx[:, None], ky[:, None], kz[:, None]
    xh = pm(0, 0) * kx + pm(0, 1) * ky + pm(0, 2) * kz + pm(0, 3)
    yh = pm(1, 0) * kx + pm(1, 1) * ky + pm(1, 2) * kz + pm(1, 3)
    depth = pm(2, 0) * kx + pm(2, 1) * ky + pm(2, 2) * kz + pm(2, 3)
    d = jnp.maximum(depth, 1e-5)
    u = xh / d / image_wh[:, :, 0][..., None, None]
    v = yh / d / image_wh[:, :, 1][..., None, None]
    mask = ((depth > 1e-5)
            & (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0))
    # u/v/mask → [B, C, P, K] (one relayout each — the pair-row order
    # the kernel chunking and the KLG-minor softmax need). Barrier so
    # the projection chain is computed once, not re-fused into every
    # consumer.
    to_pk = lambda a: jnp.swapaxes(a, 2, 3)
    return jax.lax.optimization_barrier(
        (to_pk(u), to_pk(v), to_pk(mask)))


def project_points(key_points, projection_mat, image_wh):
    """Project world key points into all cameras (reference
    deformable_module.py:287-305).

    key_points: [B, P, K, 3]; projection_mat: [B, num_cams, 4, 4];
    image_wh: [B, num_cams, 2].
    Returns points_2d [B, num_cams, P, K, 2] normalized, mask same shape.
    """
    pts = jnp.concatenate(
        [key_points, jnp.ones_like(key_points[..., :1])], axis=-1)
    # [B, cams, P, K, 4]
    proj = jnp.einsum("bcij,bpkj->bcpki", projection_mat, pts)
    depth = proj[..., 2]
    uv = proj[..., :2] / jnp.maximum(depth[..., None], 1e-5)
    uv = uv / image_wh[:, :, None, None, :]
    mask = ((depth > 1e-5)
            & (uv[..., 0] > 0.0) & (uv[..., 0] < 1.0)
            & (uv[..., 1] > 0.0) & (uv[..., 1] < 1.0))
    return uv, mask


class DeformableFeatureAggregation(nn.Module):
    """Deformable multi-cam multi-scale cross-attention
    (reference deformable_module.py:94-353).

    ``backend``: "fused" runs the Pallas windowed-matmul kernel
    (ops/pallas/deformable_kernel.py; expects ``feature_maps`` as the raw
    per-level list), "xla" the chunked row-gather path (expects the
    pre-packed table), "auto" picks per device in the encoder."""
    embed_dims: int = 128
    num_groups: int = 4
    num_levels: int = 4
    num_cams: int = 6
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_camera_embed: bool = True
    residual_mode: str = "add"
    backend: str = "xla"
    spill_budget: int = 8192    # fused backend: max window-spilled
                                # pairs recomputed exactly; beyond this
                                # they are dropped (count is sown as
                                # "deformable_spill_count")
    interpret: bool = False     # run the fused Pallas kernel in
                                # interpreter mode (CPU tests)
    # key-points generator config
    num_learnable_pts: int = 6
    learnable_fixed_scale: float = 1.0
    fix_scale: Tuple[Tuple[float, float, float], ...] = ((0.0, 0.0, 0.0),)
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    scale_range: Tuple[float, float] = (0.01, 3.2)

    @nn.compact
    def __call__(self, instance_feature, anchor, anchor_embed, feature_maps,
                 projection_mat, image_wh, deterministic: bool = True):
        b, p = instance_feature.shape[:2]
        kps_gen = SparseGaussian3DKeyPointsGenerator(
            embed_dims=self.embed_dims,
            num_learnable_pts=self.num_learnable_pts,
            learnable_fixed_scale=self.learnable_fixed_scale,
            fix_scale=self.fix_scale,
            pc_range=self.pc_range,
            scale_range=self.scale_range,
            name="kps_generator")
        num_pts = kps_gen.num_pts
        if self.backend == "fused":
            # SoA keypoints+projection (lane-major [B, K, P] planes; the
            # AoS minor-3 rotation/projection ops cost ~9 ms/frame)
            learn_raw = kps_gen(anchor, instance_feature, learn_only=True)
            u_pk, v_pk, vis_kp = keypoints_projection_soa(
                anchor, learn_raw, self.fix_scale,
                self.learnable_fixed_scale, self.scale_range,
                self.pc_range, projection_mat, image_wh)
        else:
            key_points = kps_gen(anchor, instance_feature)

        # ---- attention weights (reference _get_weights :249-282)
        feature = instance_feature + anchor_embed
        if self.backend == "fused":
            # FLAT-LANE cam-major pipeline: every tensor from the Dense
            # to the kernel's pair table keeps (K·L·G = num_pts*16) flat
            # on lanes and [cams, P] on the major dims — the layout the
            # pair-table concat consumes — so the whole weights path is
            # transpose-free (the earlier P-minor softmax paid ~1.9 ms
            # of w_soft transpose + retile per call, and a (K, L, G)-
            # minor 6-D softmax ~8 ms/frame of minor-dim-4 relayouts;
            # both measured on v5e, docs/PERF.md). Ingredients:
            #  * per-group masked softmax over (cams, pts, lvls) uses
            #    ONE GLOBAL max over all groups as the stabilizer —
            #    subtracting any bound >= the per-group max leaves
            #    softmax(w)_g = e/sum(e) mathematically unchanged;
            #  * the per-group sums are broadcast back to member lanes
            #    by a constant [KLG, KLG] group-indicator matmul
            #    (160 MFLOP at flagship size) instead of materializing
            #    [.., K, L, G]-shaped reduce/broadcast pairs.
            lg = self.num_levels * self.num_groups
            klg = num_pts * lg
            if self.use_camera_embed:
                cam_embed = LinearReluLn(self.embed_dims, 1, 2, 12,
                                         name="camera_encoder")(
                    projection_mat[:, :, :3].reshape(
                        b, self.num_cams, 12))
                feature_cm = feature[:, None] + cam_embed[:, :, None]
                raw = nn.Dense(
                    lg * num_pts, kernel_init=nn.initializers.zeros,
                    name="weights_fc")(feature_cm)   # [B, C, P, L*K*G]
            else:
                raw = nn.Dense(
                    self.num_cams * lg * num_pts,
                    kernel_init=nn.initializers.zeros,
                    name="weights_fc")(feature)      # [B, P, C*L*K*G]
                raw = jnp.moveaxis(
                    raw.reshape(b, p, self.num_cams, klg), 2, 1)
            # checkpoint column order (L, K, G) → pair-row (K, L, G)
            perm = jnp.asarray(
                [(l * num_pts + k) * self.num_groups + g
                 for k in range(num_pts)
                 for l in range(self.num_levels)
                 for g in range(self.num_groups)], jnp.int32)
            w = raw[..., perm]                       # [B, C, P, KLG]
            # vis_kp [B, C, P, K] → lanes (pair k -> lanes [16k, 16k+16))
            mask = jnp.repeat(vis_kp, lg, axis=-1)
            if self.attn_drop > 0 and not deterministic:
                rng = self.make_rng("dropout")
                mask = mask & (jax.random.uniform(rng, w.shape)
                               > self.attn_drop)
            # group-indicator matrix: lanes i, j in the same group g
            grp = jnp.arange(klg) % self.num_groups
            same_g = (grp[:, None] == grp[None, :]).astype(jnp.float32)
            maskf = mask.astype(jnp.float32)
            cnt = jax.lax.dot_general(              # [B, P, KLG]
                maskf.sum(1), same_g, (((2,), (0,)), ((), ())))
            miss = cnt == 0.0                       # per-(P, group) lanes
            m = jnp.max(jnp.where(mask, w, -jnp.inf), axis=(1, 3),
                        keepdims=True)              # [B, 1, P, 1]
            # minimum(., 0): w - m <= 0 on every masked lane by
            # construction; the clamp only guards UNmasked lanes (and
            # all-miss anchors, where m = -inf) from exp overflow before
            # maskf zeroes them.
            e = jnp.exp(jnp.minimum(w - jnp.maximum(m, -1e30), 0.0)) \
                * maskf
            s = jax.lax.dot_general(                # [B, P, KLG]
                e.sum(1, dtype=jnp.float32), same_g,
                (((2,), (0,)), ((), ())))
            # max(s, 1e-30): a group whose max logit sits ~104+ below
            # the GLOBAL stabilizer m underflows e to exactly 0, giving
            # s=0 with cnt>0 → 0/0 NaN without the clamp (the per-group
            # reference softmax cannot hit this)
            w_soft = e / jnp.where(miss, 1.0,
                                   jnp.maximum(s, 1e-30))[:, None]
            from ...ops.deformable import deformable_aggregation_fused_cm
            # key-point reduction is fused into the kernel → [b, p, C]
            features, n_spill = deformable_aggregation_fused_cm(
                feature_maps, (u_pk, v_pk), w_soft, self.num_groups,
                num_pts, spill_budget=self.spill_budget,
                return_spill_count=True, interpret=self.interpret)
            # pairs beyond spill_budget are silently dropped by the
            # cleanup gather — surface the per-call count so
            # utils.check_deformable_spill / trace_forward can make an
            # over-budget checkpoint loud (same failure class as the
            # DCN offset margin). DCE'd when intermediates aren't
            # collected.
            self.sow("intermediates", "deformable_spill_count", n_spill)
            output = nn.Dense(self.embed_dims, name="output_proj")(
                features)
            output = nn.Dropout(self.proj_drop,
                                deterministic=deterministic)(output)
            if self.residual_mode == "add":
                return output + instance_feature
            if self.residual_mode == "cat":
                return jnp.concatenate([output, instance_feature],
                                       axis=-1)
            return output

        if self.use_camera_embed:
            cam_embed = LinearReluLn(self.embed_dims, 1, 2, 12,
                                     name="camera_encoder")(
                projection_mat[:, :, :3].reshape(b, self.num_cams, 12))
            feature = feature[:, :, None] + cam_embed[:, None]
            weights = nn.Dense(
                self.num_groups * self.num_levels * num_pts,
                kernel_init=nn.initializers.zeros,
                name="weights_fc")(feature)
            # [B, P, cams, lvls*pts*groups] → canonical order below
            weights = weights.reshape(
                b, p, self.num_cams, self.num_levels, num_pts,
                self.num_groups)
        else:
            weights = nn.Dense(
                self.num_groups * self.num_cams * self.num_levels * num_pts,
                kernel_init=nn.initializers.zeros,
                name="weights_fc")(feature)
            weights = weights.reshape(
                b, p, self.num_cams, self.num_levels, num_pts,
                self.num_groups)

        points_2d, vis_mask = project_points(
            key_points, projection_mat, image_wh)

        if self.attn_drop > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.uniform(rng, weights.shape) \
                > self.attn_drop
        else:
            keep = jnp.ones(weights.shape, bool)

        # [B, P, pts, cams, lvls, groups] (reference permute :180-205)
        weights = jnp.transpose(weights, (0, 1, 4, 2, 3, 5))
        keep = jnp.transpose(keep, (0, 1, 4, 2, 3, 5))

        # vis: [B, cams, P, pts] → [B, P, pts, cams]
        vis = jnp.transpose(vis_mask, (0, 2, 3, 1))
        mask = vis[..., None, None] & keep
        all_miss = jnp.sum(mask, axis=(2, 3, 4), keepdims=True) == 0

        # softmax over (pts, cams, lvls) with -inf at masked entries;
        # rows that miss every camera are softmaxed over zeros and
        # then zeroed out entirely (reference :219-224 — avoids NaN
        # from all -inf).
        miss_b = jnp.broadcast_to(all_miss, mask.shape)
        w = jnp.where(mask, weights, -jnp.inf)
        w = jnp.where(miss_b, 0.0, w)
        w_flat = w.reshape(
            b, p, num_pts * self.num_cams * self.num_levels,
            self.num_groups)
        w_soft = jax.nn.softmax(w_flat, axis=-2)
        w_soft = jnp.where(miss_b.reshape(w_flat.shape), 0.0, w_soft)
        w_soft = w_soft.reshape(b, p * num_pts,
                                self.num_cams, self.num_levels,
                                self.num_groups)

        loc = jnp.transpose(points_2d, (0, 2, 3, 1, 4)).reshape(
            b, p * num_pts, self.num_cams, 2)
        features = deformable_aggregation(
            feature_maps, loc, w_soft, self.num_groups)
        features = features.reshape(b, p, num_pts, self.embed_dims)
        features = jnp.sum(features, axis=2)

        output = nn.Dense(self.embed_dims, name="output_proj")(features)
        output = nn.Dropout(self.proj_drop,
                            deterministic=deterministic)(output)
        if self.residual_mode == "add":
            output = output + instance_feature
        elif self.residual_mode == "cat":
            output = jnp.concatenate([output, instance_feature], axis=-1)
        return output


class SparseConv3DModule(nn.Module):
    """Submanifold sparse-conv self-encoding of anchors
    (reference spconv3d_module.py:10-83)."""
    in_channels: int = 128
    embed_channels: int = 128
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    grid_size: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    kernel_size: int = 5
    use_out_proj: bool = False
    use_multi_layer: bool = False

    @nn.compact
    def __call__(self, instance_feature, anchor,
                 deterministic: bool = True):
        b = instance_feature.shape[0]
        xyz = cartesian(anchor[..., :3], self.pc_range)
        coords, grid_shape = voxel_indices(
            xyz, self.pc_range, self.grid_size)

        # bf16 compute on accelerators (fp32 accumulation). The dense
        # formulation turns the 125-tap neighbor gather into MXU conv
        # FLOPs and its backward into transposed convolutions — the
        # gather path's backward scatter-adds cost ~470 ms/step on v5e.
        # A pair-table ("rulebook") inference formulation measured
        # SLOWER (53.9 vs 22.6 ms/fwd — XLA TPU row gathers run ~17
        # GB/s on the U-matrix reads; docs/PERF.md, preserved in git
        # history at commit 0233ea2), so inference uses dense-2D too.
        cdt = (jnp.bfloat16 if jax.default_backend() != "cpu" else None)
        from ...ops.sparse_conv import submanifold_conv3d_dense2d

        def conv_layer(feats, crds, name, c_in, c_out, use_bias,
                       dense_prev=None):
            k = self.kernel_size
            w = self.param(
                name + "_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (k, k, k, c_in, c_out))
            bias = (self.param(name + "_bias", nn.initializers.zeros,
                               (c_out,)) if use_bias else None)
            def fn(f, c, d):
                return submanifold_conv3d_dense2d(
                    f, c, grid_shape, w, bias, compute_dtype=cdt,
                    dense_reuse=d, return_dense=True)
            if dense_prev is None:
                return jax.vmap(lambda f, c: fn(f, c, None))(feats, crds)
            return jax.vmap(fn)(feats, crds, dense_prev)

        x = instance_feature
        if self.use_multi_layer:
            dense = None
            for i in range(3):
                c_in = self.in_channels if i == 0 else self.embed_channels
                # stacked layers share coords and channel width: recycle
                # the scatter table (overwrite anchor rows in place)
                # instead of zero-filling a fresh 80k-row table per layer
                reuse = dense if c_in == self.embed_channels else None
                x, dense = conv_layer(x, coords, f"conv{i}", c_in,
                                      self.embed_channels, use_bias=True,
                                      dense_prev=reuse)
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(x)
                x = nn.relu(x)
        else:
            x, _ = conv_layer(x, coords, "conv0", self.in_channels,
                              self.embed_channels, use_bias=False)
        if self.use_out_proj:
            x = nn.Dense(self.embed_channels, name="output_proj")(x)
        return x


class SparseGaussian3DRefinementModule(nn.Module):
    """v1 additive refinement (reference refine_module.py:11-123)."""
    embed_dims: int = 128
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    scale_range: Tuple[float, float] = (0.08, 0.64)
    restrict_xyz: bool = False
    unit_xyz: Optional[Tuple[float, float, float]] = None
    refine_manual: Optional[Tuple[int, ...]] = None
    semantic_dim: int = 17
    include_opa: bool = True
    semantics_activation: str = "softmax"
    xyz_coordinate: str = "cartesian"    # "cartesian" | "polar"
    phi_activation: str = "sigmoid"      # "sigmoid" | "loop" (polar only)

    @nn.compact
    def __call__(self, instance_feature, anchor, anchor_embed):
        out_dim = 10 + int(self.include_opa) + self.semantic_dim
        sem_start = 10 + int(self.include_opa)

        x = LinearReluLn(self.embed_dims, 2, 2, name="layers")(
            instance_feature + anchor_embed)
        output = nn.Dense(out_dim, name="out_fc")(x)
        output = ChannelScale(out_dim, name="out_scale")(output)

        if self.restrict_xyz:
            unit_prob = [
                self.unit_xyz[i]
                / (self.pc_range[i + 3] - self.pc_range[i]) * 4.0
                for i in range(3)
            ]
            delta_prob = 2.0 * safe_sigmoid(output[..., :3]) - 1.0
            delta = delta_prob * jnp.asarray(unit_prob, jnp.float32)
            output = jnp.concatenate([delta, output[..., 3:]], axis=-1)

        if self.refine_manual:
            k = len(self.refine_manual)
            refined = output[..., :k] + anchor[..., :k]
            output = jnp.concatenate([refined, output[..., k:]], axis=-1)

        xyz_a = output[..., :3]
        scale_a = output[..., 3:6]
        rot = output[..., 6:10]
        rot = rot / jnp.maximum(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        output = jnp.concatenate(
            [xyz_a, scale_a, rot, output[..., 10:]], axis=-1)

        if self.xyz_coordinate == "polar":
            xyz = spherical_to_cartesian(output, self.pc_range,
                                         self.phi_activation)
        else:
            xyz = cartesian(xyz_a, self.pc_range)
        gs_scales = safe_sigmoid(scale_a)
        gs_scales = (self.scale_range[0]
                     + (self.scale_range[1] - self.scale_range[0]) * gs_scales)

        semantics = output[..., sem_start:sem_start + self.semantic_dim]
        semantics = _apply_semantics_activation(
            semantics, self.semantics_activation)

        gaussian = GaussianPrediction(
            means=xyz,
            scales=gs_scales,
            rotations=rot,
            opacities=safe_sigmoid(
                output[..., 10:10 + int(self.include_opa)]),
            semantics=semantics,
        )
        return output, gaussian


class SparseGaussian3DRefinementModuleV2(nn.Module):
    """v2 refinement: world-space bounded xyz delta; scale/rot/opa/sem
    replaced (reference refine_module_v2.py:12-108)."""
    embed_dims: int = 128
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    scale_range: Tuple[float, float] = (0.01, 3.2)
    unit_xyz: Tuple[float, float, float] = (4.0, 4.0, 1.0)
    semantic_dim: int = 17
    include_opa: bool = True
    semantics_activation: str = "identity"

    @nn.compact
    def __call__(self, instance_feature, anchor, anchor_embed):
        out_dim = 10 + int(self.include_opa) + self.semantic_dim
        sem_start = 10 + int(self.include_opa)

        x = LinearReluLn(self.embed_dims, 2, 2, name="layers")(
            instance_feature + anchor_embed)
        output = nn.Dense(out_dim, name="out_fc")(x)
        output = ChannelScale(out_dim, name="out_scale")(output)

        unit = jnp.asarray(self.unit_xyz, jnp.float32)
        delta_xyz = (2.0 * safe_sigmoid(output[..., :3]) - 1.0) * unit
        original_xyz = cartesian(anchor[..., :3], self.pc_range)
        anchor_xyz = reverse_cartesian(original_xyz + delta_xyz,
                                       self.pc_range)

        scale_a = output[..., 3:6]
        rot = output[..., 6:10]
        rot = rot / jnp.maximum(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        opa = output[..., 10:10 + int(self.include_opa)]
        sem = output[..., sem_start:sem_start + self.semantic_dim]

        new_anchor = jnp.concatenate(
            [anchor_xyz, scale_a, rot, opa, sem], axis=-1)

        xyz = cartesian(anchor_xyz, self.pc_range)
        gs_scales = safe_sigmoid(scale_a)
        gs_scales = (self.scale_range[0]
                     + (self.scale_range[1] - self.scale_range[0]) * gs_scales)
        semantics = _apply_semantics_activation(
            sem, self.semantics_activation)

        gaussian = GaussianPrediction(
            means=xyz,
            scales=gs_scales,
            rotations=rot,
            opacities=safe_sigmoid(opa),
            semantics=semantics,
            original_means=original_xyz,
            delta_means=delta_xyz,
        )
        return new_anchor, gaussian


def _apply_semantics_activation(semantics, activation: str):
    if activation == "softmax":
        return jax.nn.softmax(semantics, axis=-1)
    if activation == "softplus":
        return jax.nn.softplus(semantics)
    return semantics
