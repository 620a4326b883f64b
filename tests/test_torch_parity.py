"""End-to-end torch-vs-JAX activation parity harness.

The reference's de-facto regression test is eval against released
checkpoints (readme.md:105-111) — not runnable here without nuScenes
data. This harness is the strongest substitute: the reference encoder /
head modules are TRANSCRIBED into plain torch below (faithful to
model/encoder/gaussian_encoder/{anchor_encoder_module.py:8-53,
ffn_module.py:8-75, deformable_module.py:18-353, refine_module.py:11-123,
refine_module_v2.py:12-108}, model/utils/{utils.py:20-69, safe_ops.py},
and the DAF CUDA sampling convention of
ops/src/deformable_aggregation_cuda.cu:125-187), a synthetic reference
state_dict with exact reference key names is loaded into BOTH sides (the
torch side via load_state_dict, the JAX side via the converter), and the
full encoder forward + head post-processing must agree.

spconv layers are excluded from the op order here: the reference's
SubMConv3d comes from the spconv CUDA package, which has no CPU torch
build — its JAX equivalent is covered by ops/sparse_conv tests and the
converter layout test instead.
"""
import sys
import os

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_converter_full import (E, SEM, GROUPS, LEVELS, PTS,  # noqa: E402
                                 synth_full_state_dict)

from gaussianformer_tpu.models.encoder.gaussian_encoder import (  # noqa: E402
    GaussianOccEncoder)
from gaussianformer_tpu.utils.torch_convert import convert_encoder  # noqa: E402

PC_RANGE = (-10.0, -10.0, -2.0, 10.0, 10.0, 2.0)
SCALE_RANGE = (0.1, 0.6)
UNIT_XYZ = (1.0, 1.0, 0.5)
CAMS = 2
SHAPES = ((12, 20), (6, 10), (3, 5), (2, 3))
P = 20          # anchors
OP_ORDER = ("deformable", "norm", "ffn", "norm", "refine")


# ---------------------------------------------------------------- torch side
def t_safe_sigmoid(x):
    return torch.sigmoid(torch.clamp(x, -9.21, 9.21))


def t_safe_inverse_sigmoid(x):
    x = torch.clamp(x, 1 - 0.9999, 0.9999)
    return torch.log(x / (1 - x))


def t_rotation_matrix(q):
    q = F.normalize(q, dim=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m1 = torch.zeros(*q.shape[:-1], 4, 4, dtype=q.dtype)
    m1[..., 0, 0], m1[..., 0, 1], m1[..., 0, 2], m1[..., 0, 3] = w, -x, -y, -z
    m1[..., 1, 0], m1[..., 1, 1], m1[..., 1, 2], m1[..., 1, 3] = x, w, -z, y
    m1[..., 2, 0], m1[..., 2, 1], m1[..., 2, 2], m1[..., 2, 3] = y, z, w, -x
    m1[..., 3, 0], m1[..., 3, 1], m1[..., 3, 2], m1[..., 3, 3] = z, -y, x, w
    m2 = torch.zeros_like(m1)
    m2[..., 0, 0], m2[..., 0, 1], m2[..., 0, 2], m2[..., 0, 3] = w, -x, -y, -z
    m2[..., 1, 0], m2[..., 1, 1], m2[..., 1, 2], m2[..., 1, 3] = x, w, z, -y
    m2[..., 2, 0], m2[..., 2, 1], m2[..., 2, 2], m2[..., 2, 3] = y, -z, w, x
    m2[..., 3, 0], m2[..., 3, 1], m2[..., 3, 2], m2[..., 3, 3] = z, y, -x, w
    m2 = m2.transpose(-1, -2)
    return torch.matmul(m1, m2)[..., 1:, 1:]


def t_cartesian(a, pc):
    xyz = t_safe_sigmoid(a[..., :3])
    return torch.stack([
        xyz[..., 0] * (pc[3] - pc[0]) + pc[0],
        xyz[..., 1] * (pc[4] - pc[1]) + pc[1],
        xyz[..., 2] * (pc[5] - pc[2]) + pc[2]], dim=-1)


def t_reverse_cartesian(xyz, pc):
    u = torch.stack([
        (xyz[..., 0] - pc[0]) / (pc[3] - pc[0]),
        (xyz[..., 1] - pc[1]) / (pc[4] - pc[1]),
        (xyz[..., 2] - pc[2]) / (pc[5] - pc[2])], dim=-1)
    return t_safe_inverse_sigmoid(u)


class TScale(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(n))

    def forward(self, x):
        return x * self.scale


def t_lrl(embed, in_loops, out_loops, input_dims=None):
    if input_dims is None:
        input_dims = embed
    layers = []
    for _ in range(out_loops):
        for _ in range(in_loops):
            layers.append(nn.Linear(input_dims, embed))
            layers.append(nn.ReLU())
            input_dims = embed
        layers.append(nn.LayerNorm(embed))
    return layers


class TAnchorEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        def emb(i):
            return nn.Sequential(*t_lrl(E, 1, 2, i))
        self.xyz_fc = emb(3)
        self.scale_fc = emb(3)
        self.rot_fc = emb(4)
        self.opacity_fc = emb(1)
        self.semantics_fc = emb(SEM)
        self.output_fc = emb(E)

    def forward(self, a):
        out = (self.xyz_fc(a[..., :3]) + self.scale_fc(a[..., 3:6])
               + self.rot_fc(a[..., 6:10]) + self.opacity_fc(a[..., 10:11])
               + self.semantics_fc(a[..., 11:11 + SEM]))
        return self.output_fc(out)


class TFFN(nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(E, 4 * E), nn.ReLU(), nn.Dropout(0.0)),
            nn.Linear(4 * E, E), nn.Dropout(0.0))

    def forward(self, x):
        return x + self.layers(x)


class TKPSGen(nn.Module):
    num_learnable = PTS - 1

    def __init__(self):
        super().__init__()
        self.learnable_fc = nn.Linear(E, self.num_learnable * 3)

    def forward(self, anchor, instance_feature):
        bs, p = anchor.shape[:2]
        fix = torch.zeros(bs, p, 1, 3)
        learn = (t_safe_sigmoid(self.learnable_fc(instance_feature)
                                .reshape(bs, p, self.num_learnable, 3))
                 - 0.5)
        scale = torch.cat([fix, learn], dim=-2)
        gs = t_safe_sigmoid(anchor[..., None, 3:6])
        gs = SCALE_RANGE[0] + (SCALE_RANGE[1] - SCALE_RANGE[0]) * gs
        kp = scale * gs
        rot = t_rotation_matrix(anchor[..., 6:10]).transpose(-1, -2)
        kp = torch.matmul(rot[:, :, None], kp[..., None]).squeeze(-1)
        xyz = t_cartesian(anchor, PC_RANGE)
        return kp + xyz.unsqueeze(2)


def t_project_points(key_points, projection_mat, image_wh):
    pts = torch.cat([key_points, torch.ones_like(key_points[..., :1])], -1)
    p2d = torch.matmul(projection_mat[:, :, None, None],
                       pts[:, None, ..., None]).squeeze(-1)
    depth = p2d[..., 2]
    p2d = p2d[..., :2] / torch.clamp(p2d[..., 2:3], min=1e-5)
    p2d = p2d / image_wh[:, :, None, None]
    mask = ((depth > 1e-5) & (p2d[..., 0] > 0) & (p2d[..., 0] < 1)
            & (p2d[..., 1] > 0) & (p2d[..., 1] < 1))
    return p2d, mask


def t_daf_sample(feature_maps, points_2d, weights):
    """Transcription of the DAF CUDA forward
    (deformable_aggregation_cuda.cu:125-187): strict-inside gate, pixel
    coords u*W - 0.5, zero out-of-image corners, per-group weights."""
    bs, q, cams, _ = points_2d.shape
    c = feature_maps[0].shape[2]
    gd = c // GROUPS
    out = torch.zeros(bs, q, c)
    for lvl, fm in enumerate(feature_maps):
        h, w = fm.shape[-2:]
        u = points_2d[..., 0]
        v = points_2d[..., 1]
        inside = (u > 0) & (u < 1) & (v > 0) & (v < 1)
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = torch.floor(x).long()
        y0 = torch.floor(y).long()
        fx = (x - x0.float())
        fy = (y - y0.float())
        sample = torch.zeros(bs, q, cams, c)
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                ok = (cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1)
                wgt = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx)
                       * ok * inside)
                cxc = cx.clamp(0, w - 1)
                cyc = cy.clamp(0, h - 1)
                for b in range(bs):
                    for cam in range(cams):
                        vals = fm[b, cam, :, cyc[b, :, cam],
                                  cxc[b, :, cam]].T
                        sample[b, :, cam] += vals * wgt[b, :, cam, None]
        wl = weights[:, :, :, lvl, :]                   # [bs, q, cams, G]
        out = out + (sample.reshape(bs, q, cams, GROUPS, gd)
                     * wl[..., None]).sum(2).reshape(bs, q, c)
    return out


class TDeformable(nn.Module):
    def __init__(self):
        super().__init__()
        self.kps_generator = TKPSGen()
        self.camera_encoder = nn.Sequential(*t_lrl(E, 1, 2, 12))
        self.weights_fc = nn.Linear(E, GROUPS * LEVELS * PTS)
        self.output_proj = nn.Linear(E, E)

    def forward(self, instance_feature, anchor, anchor_embed, feature_maps,
                projection_mat, image_wh):
        bs, p = instance_feature.shape[:2]
        key_points = self.kps_generator(anchor, instance_feature)
        feature = instance_feature + anchor_embed
        cam_embed = self.camera_encoder(
            projection_mat[:, :, :3].reshape(bs, CAMS, 12))
        feature = feature[:, :, None] + cam_embed[:, None]
        weights = self.weights_fc(feature).reshape(
            bs, p, CAMS, LEVELS, PTS, GROUPS)
        weights = weights.permute(0, 1, 4, 2, 3, 5).contiguous().reshape(
            bs, p, PTS, CAMS, LEVELS, GROUPS)
        points_2d, mask = t_project_points(key_points, projection_mat,
                                           image_wh)
        points_2d = points_2d.permute(0, 2, 3, 1, 4).reshape(
            bs, p * PTS, CAMS, 2)
        mask = mask.permute(0, 2, 3, 1)
        mask = mask[..., None, None].expand(-1, -1, -1, -1, LEVELS, GROUPS)
        all_miss = mask.sum(dim=[2, 3, 4], keepdim=True) == 0
        all_miss = all_miss.expand(-1, -1, PTS, CAMS, LEVELS, -1)
        weights = weights.masked_fill(~mask, -torch.inf)
        weights = weights.masked_fill(all_miss, 0.0)
        weights = weights.flatten(2, 4).softmax(dim=-2).reshape(
            bs, p * PTS, CAMS, LEVELS, GROUPS)
        weights = weights * (1 - all_miss.flatten(1, 2).float())
        feats = t_daf_sample(feature_maps, points_2d, weights).reshape(
            bs, p, PTS, E)
        feats = feats.sum(dim=2)
        out = self.output_proj(feats)
        return out + instance_feature


class TRefineV2(nn.Module):
    def __init__(self):
        super().__init__()
        out_dim = 11 + SEM
        self.layers = nn.Sequential(*t_lrl(E, 2, 2), nn.Linear(E, out_dim),
                                    TScale(out_dim))
        self.register_buffer("unit_xyz", torch.tensor(UNIT_XYZ), False)

    def forward(self, instance_feature, anchor, anchor_embed):
        out = self.layers(instance_feature + anchor_embed)
        delta = (2 * t_safe_sigmoid(out[..., :3]) - 1.0) \
            * self.unit_xyz[None, None]
        orig = t_cartesian(anchor, PC_RANGE)
        new_xyz = t_reverse_cartesian(orig + delta, PC_RANGE)
        rot = F.normalize(out[..., 6:10], 2, -1)
        anchor_new = torch.cat(
            [new_xyz, out[..., 3:6], rot, out[..., 10:11],
             out[..., 11:11 + SEM]], dim=-1)
        means = t_cartesian(new_xyz, PC_RANGE)
        scales = SCALE_RANGE[0] + (SCALE_RANGE[1] - SCALE_RANGE[0]) \
            * t_safe_sigmoid(out[..., 3:6])
        # shipped v2 configs: semantics_activation='identity'
        # (config/prob/nuscenes_gs6400.py:193)
        sem = out[..., 11:11 + SEM]
        opa = t_safe_sigmoid(out[..., 10:11])
        return anchor_new, dict(means=means, scales=scales, rotations=rot,
                                opacities=opa, semantics=sem)


class TEncoder(nn.Module):
    def __init__(self, op_order):
        super().__init__()
        self.op_order = op_order
        self.anchor_encoder = TAnchorEncoder()
        mods = []
        for op in op_order:
            if op == "norm":
                mods.append(nn.LayerNorm(E))
            elif op == "ffn":
                mods.append(TFFN())
            elif op == "deformable":
                mods.append(TDeformable())
            elif op == "refine":
                mods.append(TRefineV2())
        self.layers = nn.ModuleList(mods)

    def forward(self, anchor, instance_feature, feature_maps,
                projection_mat, image_wh):
        anchor_embed = self.anchor_encoder(anchor)
        preds = []
        for i, op in enumerate(self.op_order):
            layer = self.layers[i]
            if op == "norm":
                instance_feature = layer(instance_feature)
            elif op == "ffn":
                instance_feature = layer(instance_feature)
            elif op == "deformable":
                instance_feature = layer(
                    instance_feature, anchor, anchor_embed, feature_maps,
                    projection_mat, image_wh)
            elif op == "refine":
                anchor, g = layer(instance_feature, anchor, anchor_embed)
                preds.append(g)
                if i != len(self.op_order) - 1:
                    anchor_embed = self.anchor_encoder(anchor)
        return anchor, instance_feature, preds


# ----------------------------------------------------------------- fixtures
def _projection(bs):
    """Simple plausible pinhole cameras looking +x / -x."""
    mats = []
    for cam in range(CAMS):
        intr = np.array([[30.0, 0, 50.0, 0], [0, 30.0, 30.0, 0],
                         [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
        rot = np.eye(4)
        if cam == 1:
            rot[:3, :3] = np.diag([-1.0, -1.0, 1.0])    # rear camera
        mats.append(intr @ rot)
    m = np.stack(mats)
    return np.broadcast_to(m, (bs,) + m.shape).copy()


def _overlay(dst, src, path=""):
    for k, v in src.items():
        assert k in dst, f"converted key {path}/{k} missing in init tree"
        if isinstance(v, dict):
            _overlay(dst[k], v, f"{path}/{k}")
        else:
            assert tuple(dst[k].shape) == tuple(np.shape(v)), \
                f"{path}/{k}: {dst[k].shape} vs {np.shape(v)}"
            dst[k] = jnp.asarray(v, jnp.float32)


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.RandomState(7)
    sd = {k: v for k, v in synth_full_state_dict(OP_ORDER).items()
          if k.startswith("encoder.")}
    # give the zero-initialized heads signal so parity is non-trivial
    for k in list(sd):
        if "weights_fc" in k or "learnable_fc" in k:
            sd[k] = rng.randn(*np.shape(sd[k])) * 0.5
    sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}

    anchor = rng.randn(1, P, 11 + SEM) * 0.7
    inst = rng.randn(1, P, E) * 0.5
    feats = [rng.randn(1, CAMS, E, h, w) for (h, w) in SHAPES]
    proj = _projection(1)
    wh = np.full((1, CAMS, 2), 100.0)
    return sd, anchor, inst, feats, proj, wh


def test_encoder_end_to_end_parity(parity_setup):
    sd, anchor, inst, feats, proj, wh = parity_setup

    # ---- torch side
    tenc = TEncoder(OP_ORDER)
    tsd = {k[len("encoder."):]: torch.tensor(v, dtype=torch.float32)
           for k, v in sd.items()}
    missing, unexpected = tenc.load_state_dict(tsd, strict=True), None
    with torch.no_grad():
        t_anchor, t_feat, t_preds = tenc(
            torch.tensor(anchor, dtype=torch.float32),
            torch.tensor(inst, dtype=torch.float32),
            [torch.tensor(f, dtype=torch.float32) for f in feats],
            torch.tensor(proj, dtype=torch.float32),
            torch.tensor(wh, dtype=torch.float32))

    # ---- JAX side (converter-loaded)
    enc = GaussianOccEncoder(
        operation_order=OP_ORDER, embed_dims=E, include_opa=True,
        semantic_dim=SEM, refine_version=2,
        ffn_cfg=dict(embed_dims=E, feedforward_channels=4 * E),
        deformable_cfg=dict(
            embed_dims=E, num_groups=GROUPS, num_levels=LEVELS,
            num_cams=CAMS, use_camera_embed=True,
            num_learnable_pts=PTS - 1, fix_scale=((0.0, 0.0, 0.0),),
            pc_range=PC_RANGE, scale_range=SCALE_RANGE, backend="xla"),
        refine_cfg=dict(embed_dims=E, pc_range=PC_RANGE,
                        scale_range=SCALE_RANGE,
                        unit_xyz=UNIT_XYZ, semantic_dim=SEM,
                        include_opa=True))
    j_feats = [jnp.asarray(np.moveaxis(f, 2, -1), jnp.float32)
               for f in feats]
    args = (jnp.asarray(anchor, jnp.float32), jnp.asarray(inst, jnp.float32),
            j_feats, jnp.asarray(proj, jnp.float32),
            jnp.asarray(wh, jnp.float32))
    variables = enc.init(jax.random.PRNGKey(0), *args)
    params = jax.device_get(variables["params"])

    out_params, consumed = {}, set()
    convert_encoder(sd, OP_ORDER, out_params, consumed, prefix="encoder.",
                    dst="enc")
    assert consumed == set(sd), sorted(set(sd) - consumed)[:5]
    _overlay(params, out_params["enc"])

    out = enc.apply({"params": params}, *args)
    j_anchor = np.asarray(out["final_anchor"])[0]
    j_feat = np.asarray(out["features"])[0]
    j_pred = out["representation"][-1]

    np.testing.assert_allclose(j_feat, t_feat.numpy()[0], rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(j_anchor, t_anchor.numpy()[0], rtol=1e-4,
                               atol=2e-4)
    tp = t_preds[-1]
    for field in ("means", "scales", "rotations", "opacities", "semantics"):
        np.testing.assert_allclose(
            np.asarray(getattr(j_pred, field))[0], tp[field].numpy()[0],
            rtol=1e-4, atol=2e-4, err_msg=field)


# ------------------------------------------------------------- head parity
def t_prepare_gaussian_args(means, scales, rotations, opacities, semantics):
    """Transcription of GaussianHead.prepare_gaussian_args (reference
    model/head/gaussian_head.py:82-120), use_localaggprob non-empty path:
    semantics softmax + zero empty channel; Cov = (S R)^T (S R); CovInv
    via matrix inverse."""
    sem = semantics.softmax(dim=-1)
    sem = torch.cat([sem, torch.zeros_like(sem[..., :1])], dim=-1)
    bs, g, _ = means.shape
    S = torch.zeros(bs, g, 3, 3)
    S[..., 0, 0] = scales[..., 0]
    S[..., 1, 1] = scales[..., 1]
    S[..., 2, 2] = scales[..., 2]
    R = t_rotation_matrix(rotations)
    M = torch.matmul(S, R)
    Cov = torch.matmul(M.transpose(-1, -2), M)
    CovInv = Cov.inverse()
    return means, opacities.squeeze(-1), sem, scales, CovInv


def t_dense_prob_splat(pts, means, opa, sem, scales, cov_inv, grid_lo,
                       grid_size, mult, radii_min=1, per_axis=True):
    """Dense transcription of the GMM splat render
    (localagg_prob_fast/src/forward.cu:34-102 + the radii/voxelize prep of
    local_aggregate_prob_fast/__init__.py:137-153)."""
    norm3d = (2 * np.pi) ** (-1.5)
    lo = torch.tensor(grid_lo)
    vp = torch.floor((pts - lo) / grid_size).long()        # [N, 3]
    vg = torch.floor((means - lo) / grid_size).long()      # [P, 3]
    if per_axis:
        radii = torch.ceil(scales * mult / grid_size).long()
    else:
        radii = torch.ceil(
            scales.max(-1, keepdim=True).values * mult / grid_size
        ).long().expand(-1, 3)
    radii = radii.clamp(min=radii_min)
    d = means[None, :, :] - pts[:, None, :]                # [N, P, 3]
    quad = torch.einsum("npi,pij,npj->np", d, cov_inv, d)
    power = torch.exp(-0.5 * quad)
    mask = ((vp[:, None, :] - vg[None, :, :]).abs()
            <= radii[None, :, :]).all(-1)
    power = power * mask
    det = torch.det(cov_inv)
    prob = power * (norm3d * det.clamp(min=0).sqrt() * opa)[None, :]
    prob_sum = prob.sum(-1)
    c = sem.shape[-1]
    logits = torch.where(
        (prob_sum > 1e-9)[:, None],
        (prob @ sem) / prob_sum.clamp(min=1e-9)[:, None],
        torch.cat([torch.full((c - 1,), 1.0 / (c - 1)),
                   torch.zeros(1)])[None, :].expand(pts.shape[0], c))
    bin_logits = 1.0 - (1.0 - power).prod(-1)
    density = power.sum(-1)
    return logits, bin_logits, density


def test_head_parity():
    from gaussianformer_tpu.models.head.gaussian_head import GaussianHead
    from gaussianformer_tpu.models.encoder.modules import GaussianPrediction
    from gaussianformer_tpu.ops.splat import SplatGridSpec

    rng = np.random.RandomState(11)
    B, P2, C0 = 1, 30, SEM
    H, W, D = 8, 8, 4
    grid = SplatGridSpec(H=H, W=W, D=D, pc_min=(-8.0, -8.0, -2.0),
                         grid_size=2.0, scale_multiplier=4.0, radii_min=1)
    means = rng.uniform(-7, 7, (B, P2, 3))
    means[..., 2] = rng.uniform(-1.5, 1.5, (B, P2))
    scales = rng.uniform(0.3, 1.5, (B, P2, 3))
    rots = rng.randn(B, P2, 4)
    opac = rng.uniform(0.3, 1.0, (B, P2, 1))
    sem = rng.randn(B, P2, C0)

    xs = (np.arange(H) + 0.5) * 2.0 - 8.0
    ys = (np.arange(W) + 0.5) * 2.0 - 8.0
    zs = (np.arange(D) + 0.5) * 2.0 - 2.0
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    occ_xyz = np.stack([gx, gy, gz], -1)[None]

    # ---- torch transcription
    tm, topa, tsem, tscales, tcovinv = t_prepare_gaussian_args(
        torch.tensor(means, dtype=torch.float32),
        torch.tensor(scales, dtype=torch.float32),
        torch.tensor(rots, dtype=torch.float32),
        torch.tensor(opac, dtype=torch.float32),
        torch.tensor(sem, dtype=torch.float32))
    t_logits, t_bins, t_dens = t_dense_prob_splat(
        torch.tensor(occ_xyz.reshape(-1, 3), dtype=torch.float32),
        tm[0], topa[0], tsem[0], tscales[0], tcovinv[0],
        (-8.0, -8.0, -2.0), 2.0, 4.0)
    t_sem_part = t_logits[:, :-1] * t_bins[:, None]
    t_geo = 1.0 - t_bins[:, None]
    t_pred = torch.cat([t_sem_part, t_geo], dim=-1)
    t_final = t_pred.argmax(-1)

    # ---- JAX head (prob + combine_geosem, the flagship path)
    head = GaussianHead(apply_loss_type="all", use_localaggprob=True,
                        combine_geosem=True, with_empty=False, grid=grid,
                        per_axis_radii=True, splat_tile_n=64,
                        splat_chunk_g=8)
    gp = GaussianPrediction(
        means=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        rotations=jnp.asarray(rots, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        semantics=jnp.asarray(sem, jnp.float32))
    out = head.apply(
        {"params": {}}, [gp],
        occ_xyz=jnp.asarray(occ_xyz, jnp.float32),
        occ_label=jnp.zeros((B, H, W, D), jnp.int32),
        occ_cam_mask=jnp.ones((B, H, W, D), bool),
        training=True)

    np.testing.assert_allclose(np.asarray(out["pred_occ"][0])[0],
                               t_pred.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["bin_logits"][0])[0],
                               t_bins.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["density"][0])[0],
                               t_dens.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["final_occ"])[0],
                                  t_final.numpy())
