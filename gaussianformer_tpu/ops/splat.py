"""Gaussian → voxel splatting ("local aggregation") — TPU-native formulation.

The reference implements this with sort-based binning CUDA kernels
(model/head/localagg{,_prob,_prob_fast}/src/*.cu): per-Gaussian AABBs are
expanded into (voxel, gaussian) pairs, radix-sorted by voxel key, and each
query point walks its voxel's Gaussian list.

On TPU we re-derive the computation as *streaming matmuls* instead: for a
Gaussian with inverse covariance A and mean mu, the exponent

    power_logit(x) = -1/2 (mu - x)^T A (mu - x)

is linear in the 10-dim monomial feature vector

    phi(x) = [x0^2, x1^2, x2^2, x0*x1, x1*x2, x0*x2, x0, x1, x2, 1]

so a whole (voxel-tile x gaussian-chunk) block of exponents is one MXU
matmul ``phi(x) @ psi(g)^T``; the semantic accumulation
``sum_g sem[g] * prob[g](x)`` is a second matmul. The AABB cutoff of the
reference kernels is reproduced exactly with a per-pair integer box mask
(getRect semantics, localagg*/src/auxiliary.h:8-19). Everything is static
shape; gradients flow through plain JAX autodiff (with rematerialized
chunks so the N x P intermediate is never stored).

Variants (matching reference math exactly):
  - ``additive``  (v1, localagg/src/forward.cu:34-82):
        out[n, c] = sum_g sem[g, c] * opa[g] * exp(power_logit)
  - ``prob`` (v2 GMM, localagg_prob/src/forward.cu:34-102):
        prob_g   = (2 pi)^{-3/2} det(A)^{1/2} * exp(power_logit) * opa[g]
        logits   = sum_g sem[g] * prob_g / sum_g prob_g   (uniform fallback)
        bin      = 1 - prod_g (1 - exp(power_logit))
        density  = sum_g exp(power_logit)
    Isotropic radii (localagg_prob) or per-axis radii (localagg_prob_fast)
    are both supported via the ``per_axis_radii`` flag.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

_NORM_3D = math.pow(2.0 * math.pi, -1.5)


@dataclasses.dataclass(frozen=True)
class SplatGridSpec:
    """Static voxel-grid geometry (reference `cuda_kwargs`)."""
    H: int = 200
    W: int = 200
    D: int = 16
    pc_min: Tuple[float, float, float] = (-50.0, -50.0, -5.0)
    grid_size: float = 0.5
    scale_multiplier: float = 4.0
    radii_min: int = 1

    @property
    def num_voxels(self) -> int:
        return self.H * self.W * self.D

    def voxelize(self, xyz):
        """World coords → integer voxel coords (floor, clipped in-grid)."""
        pc_min = jnp.asarray(self.pc_min, dtype=xyz.dtype)
        idx = jnp.floor((xyz - pc_min) / self.grid_size).astype(jnp.int32)
        hi = jnp.asarray([self.H - 1, self.W - 1, self.D - 1], dtype=jnp.int32)
        return jnp.clip(idx, 0, hi)

    def radii(self, scales, per_axis: bool):
        """Voxel-space AABB radii from (detached) Gaussian scales."""
        scales = jax.lax.stop_gradient(scales)
        if per_axis:
            r = jnp.ceil(scales * self.scale_multiplier / self.grid_size)
        else:
            r = jnp.ceil(
                jnp.max(scales, axis=-1, keepdims=True)
                * self.scale_multiplier / self.grid_size
            )
            r = jnp.broadcast_to(r, scales.shape)
        return jnp.maximum(r.astype(jnp.int32), self.radii_min)


def det_compact(cov6):
    """Determinant of a symmetric 3x3 given as [xx, yy, zz, xy, yz, xz]."""
    xx, yy, zz = cov6[..., 0], cov6[..., 1], cov6[..., 2]
    xy, yz, xz = cov6[..., 3], cov6[..., 4], cov6[..., 5]
    return (xx * yy * zz + 2.0 * xy * yz * xz
            - xx * yz * yz - yy * xz * xz - zz * xy * xy)


def point_features(points):
    """phi(x): [..., 3] → [..., 10] monomial features."""
    x0, x1, x2 = points[..., 0], points[..., 1], points[..., 2]
    return jnp.stack(
        [x0 * x0, x1 * x1, x2 * x2, x0 * x1, x1 * x2, x0 * x2,
         x0, x1, x2, jnp.ones_like(x0)],
        axis=-1,
    )


def gaussian_coefficients(means, cov_inv6):
    """psi(g): [P, 3], [P, 6] → [P, 10] so phi(x) . psi(g) = -1/2 d^T A d."""
    xx, yy, zz = cov_inv6[..., 0], cov_inv6[..., 1], cov_inv6[..., 2]
    xy, yz, xz = cov_inv6[..., 3], cov_inv6[..., 4], cov_inv6[..., 5]
    m0, m1, m2 = means[..., 0], means[..., 1], means[..., 2]
    # A @ mu
    am0 = xx * m0 + xy * m1 + xz * m2
    am1 = xy * m0 + yy * m1 + yz * m2
    am2 = xz * m0 + yz * m1 + zz * m2
    const = -0.5 * (m0 * am0 + m1 * am1 + m2 * am2)
    return jnp.stack(
        [-0.5 * xx, -0.5 * yy, -0.5 * zz, -xy, -yz, -xz, am0, am1, am2, const],
        axis=-1,
    )


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _chunk_step(pts, pts_int, gdata, means_int, radii, opa_norm, opa, sem,
                variant: str):
    """Dense computation for one (voxel-tile, gaussian-chunk) block.

    pts:       [Nt, 3]  float query points
    pts_int:   [Nt, 3]  int voxel coords
    gdata:     [Pc, 9]  [mu(3), cov_inv6] per gaussian
    means_int: [Pc, 3]  int voxel coords of means
    radii:     [Pc, 3]  int AABB radii (already broadcast per-axis)
    opa_norm:  [Pc]     (2pi)^-1.5 sqrt(det A) * opa  (prob) — unused additive
    opa:       [Pc]     raw opacity
    sem:       [Pc, C]

    Returns per-block partial outputs (to be accumulated / multiplied).

    The exponent is computed from the displacement d = mu - x (never from a
    monomial-feature matmul): at world-scale coordinates the phi(x)·psi(g)
    decomposition cancels ~1e6-magnitude terms down to O(10) and loses
    ~1e-1 absolute in fp32, which is a >10% error after exp.
    """
    dx = gdata[None, :, 0] - pts[:, None, 0]
    dy = gdata[None, :, 1] - pts[:, None, 1]
    dz = gdata[None, :, 2] - pts[:, None, 2]
    power_logit = (-0.5 * (gdata[None, :, 3] * dx * dx
                           + gdata[None, :, 4] * dy * dy
                           + gdata[None, :, 5] * dz * dz)
                   - (gdata[None, :, 6] * dx * dy
                      + gdata[None, :, 7] * dy * dz
                      + gdata[None, :, 8] * dx * dz))
    # AABB mask: |pt_int - mean_int| <= radii, per axis (getRect semantics).
    diff = jnp.abs(pts_int[:, None, :] - means_int[None, :, :])
    mask = jnp.all(diff <= radii[None, :, :], axis=-1)
    power = jnp.exp(jnp.minimum(power_logit, 30.0)) * mask

    if variant == "additive":
        sem_acc = jnp.dot(power * opa[None, :], sem,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        return sem_acc, None, None, None

    prob = power * opa_norm[None, :]
    sem_acc = jnp.dot(prob, sem, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    prob_sum = jnp.sum(prob, axis=-1)
    density = jnp.sum(power, axis=-1)
    # log-space superposition product: gradient 1/(1-p) capped exactly like
    # the reference backward's epsilon (backward.cu:96: /(1-power+1e-9));
    # also keeps every scan carry additive.
    log1m = jnp.sum(jnp.log1p(-jnp.minimum(power, 1.0 - 1e-9)), axis=-1)
    return sem_acc, prob_sum, density, log1m


def _splat_single(points, points_int, means, means_int, opacities, semantics,
                  radii, cov_inv6, *, variant: str, tile_n: int, chunk_g: int,
                  remat: bool = True):
    """Single-batch splat: one lax.scan over gaussian chunks; each step is
    a dense (N x chunk) block (rematerialized in the backward).

    ``tile_n`` is accepted for API compatibility but unused — a single-level
    scan keeps autodiff simple (nested scans hit jax 0.9.0 transpose bugs)
    and the per-step [N, chunk_g] block bounds peak memory.
    """
    del tile_n
    n = points.shape[0]
    p = means.shape[0]
    c = semantics.shape[-1]

    p_pad = -(-p // chunk_g) * chunk_g

    gdata = jnp.concatenate([means, cov_inv6], axis=-1)  # [P, 9]
    det = det_compact(cov_inv6)
    # guard: dummy/degenerate gaussians get det clamped to keep sqrt finite
    opa_norm = _NORM_3D * jnp.sqrt(jnp.maximum(det, 1e-30)) * opacities

    gdata = _pad_to(gdata, p_pad, 0)
    means_int = _pad_to(means_int, p_pad, 0, value=-(10 ** 6))
    radii_p = _pad_to(radii, p_pad, 0, value=-1)
    opa_norm = _pad_to(opa_norm, p_pad, 0)
    opa = _pad_to(opacities, p_pad, 0)
    sem = _pad_to(semantics, p_pad, 0)

    num_chunks = p_pad // chunk_g
    chunks = (
        gdata.reshape(num_chunks, chunk_g, 9),
        means_int.reshape(num_chunks, chunk_g, 3),
        radii_p.reshape(num_chunks, chunk_g, 3),
        opa_norm.reshape(num_chunks, chunk_g),
        opa.reshape(num_chunks, chunk_g),
        sem.reshape(num_chunks, chunk_g, c),
    )

    step = functools.partial(_chunk_step, variant=variant)
    if remat:
        step = jax.checkpoint(
            step, policy=jax.checkpoint_policies.nothing_saveable)

    def chunk_body(carry, chunk):
        pts_c, pint_c, accs = carry
        gd_j, mint_j, rad_j, onorm_j, opa_j, sem_j = chunk
        sem_acc, prob_sum, density, log1m = step(
            pts_c, pint_c, gd_j, mint_j, rad_j, onorm_j, opa_j, sem_j)
        if variant == "additive":
            accs = (accs[0] + sem_acc,)
        else:
            accs = (accs[0] + sem_acc, accs[1] + prob_sum,
                    accs[2] + density, accs[3] + log1m)
        return (pts_c, pint_c, accs), None

    if variant == "additive":
        init = (jnp.zeros((n, c), jnp.float32),)
    else:
        init = (jnp.zeros((n, c), jnp.float32),
                jnp.zeros((n,), jnp.float32),
                jnp.zeros((n,), jnp.float32),
                jnp.zeros((n,), jnp.float32))
    (_, _, out), _ = jax.lax.scan(
        chunk_body, (points, points_int, init), chunks)

    if variant == "additive":
        return (out[0],)

    sem_acc = out[0]
    prob_sum = out[1]
    density = out[2]
    one_minus = jnp.exp(out[3])

    # GMM posterior with uniform fallback (forward.cu:92-98): when no Gaussian
    # covers the point, the first C-1 channels get 1/(C-1) and the last stays 0.
    covered = prob_sum > 1e-9
    denom = jnp.where(covered, prob_sum, 1.0)
    uniform = jnp.full((c,), 1.0 / (c - 1), jnp.float32).at[c - 1].set(0.0)
    logits = jnp.where(covered[:, None], sem_acc / denom[:, None],
                       uniform[None, :])
    bin_logits = 1.0 - one_minus
    return logits, bin_logits, density


def _patch_permuters(grid: SplatGridSpec, b: int, zrun: int, tile_n: int,
                     num_points: int):
    """PATCH-TILE reorder helpers (see splat() body): returns
    (eligible, to_patch, from_patch) for re-rastering the voxel grid
    into (8 x 4 x D) patches so each kernel tile has a ~4x tighter
    AABB footprint. Pure static reshape/transpose permutations."""
    px, py = 8, 4
    eligible = (zrun and tile_n == px * py * grid.D
                and grid.H % px == 0 and grid.W % py == 0
                and num_points == grid.num_voxels)

    def to_patch(a):
        d = a.shape[-1]
        return a.reshape(b, grid.H // px, px, grid.W // py, py,
                         grid.D, d).transpose(
            0, 1, 3, 2, 4, 5, 6).reshape(b, -1, d)

    def from_patch(a):
        flat = a.ndim == 2
        if flat:
            a = a[..., None]
        d = a.shape[-1]
        a = a.reshape(b, grid.H // px, grid.W // py, px, py,
                      grid.D, d).transpose(
            0, 1, 3, 2, 4, 5, 6).reshape(b, -1, d)
        return a[..., 0] if flat else a

    return eligible, to_patch, from_patch


def splat_deferred(points, means, opacities, semantics, scales, cov_inv6,
                   grid: SplatGridSpec, *, variant: str = "prob",
                   per_axis_radii: bool = True, tile_n: int = 8192,
                   chunk_g: int = 128, backend: str = "auto",
                   pallas_tile_n: int = 512, pallas_chunk_g: int = 128,
                   grid_ordered: bool = False, interpret: bool = False,
                   emit_labels=None):
    """INFERENCE-ONLY splat returning ``(outs, unpatch)``.

    On the eligible Pallas patch-tile path the outputs stay in the
    kernel's patch-tile / z-major row order and ``unpatch(a)`` restores
    voxel order for [B, N] / [B, N, C] tensors — elementwise consumers
    (logits combine, argmax) run in kernel order and only the final
    labels pay the [640k, C]-sized relayout (~3 ms/frame on v5e).
    Everywhere else it falls back to :func:`splat` with an identity
    unpatch. Bypasses the custom-VJP wrapper: NOT differentiable on the
    pallas backend.

    ``emit_labels``: dict(mode="combine"|"threshold", thresh=...,
    empty_label=...) — ALSO return final-occ labels ([B, N] int32,
    kernel order) computed by the kernel's in-VMEM epilogue (the exact
    head math; the downstream [N, C] normalize/combine/argmax chain
    then dies to DCE). Appended as the last element of ``outs``; on the
    XLA fallback the same labels are computed with XLA ops so callers
    need no backend case split."""
    kw = dict(variant=variant, per_axis_radii=per_axis_radii,
              tile_n=tile_n, chunk_g=chunk_g, backend=backend,
              pallas_tile_n=pallas_tile_n, pallas_chunk_g=pallas_chunk_g,
              grid_ordered=grid_ordered, interpret=interpret)
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() not in ("cpu",)
                   else "xla")
    zrun = grid.D if grid_ordered else 0
    patch, to_patch, from_patch = _patch_permuters(
        grid, points.shape[0], zrun, pallas_tile_n, points.shape[1])
    if backend != "pallas" or not patch:
        outs = splat(points, means, opacities, semantics, scales,
                     cov_inv6, grid, **kw)
        if emit_labels is not None:
            outs = outs + (_labels_xla(outs, variant, emit_labels),)
        return (outs, lambda a: a)

    from .pallas.splat_kernel import unpermute_zrun
    outs = _splat_pallas_fwd_only(
        to_patch(points), means, opacities, semantics, scales, cov_inv6,
        grid, variant, per_axis_radii, pallas_tile_n, pallas_chunk_g,
        interpret, zrun=zrun, defer_zrun=True, emit_labels=emit_labels)

    def unpatch(a):
        flat = a.ndim == 2
        a2 = a[..., None] if flat else a
        a2 = unpermute_zrun(a2, zrun, pallas_tile_n)
        a2 = from_patch(a2)
        return a2[..., 0] if flat else a2

    return outs, unpatch


def splat(points, means, opacities, semantics, scales, cov_inv6,
          grid: SplatGridSpec, *, variant: str = "prob",
          per_axis_radii: bool = True, tile_n: int = 8192,
          chunk_g: int = 128, backend: str = "auto",
          pallas_tile_n: int = 512, pallas_chunk_g: int = 128,
          grid_ordered: bool = False, interpret: bool = False):
    """Batched Gaussian→voxel splat.

    Args:
      points:    [B, N, 3] query points (voxel centers), no grad.
      means:     [B, P, 3] Gaussian means (world space).
      opacities: [B, P]
      semantics: [B, P, C]
      scales:    [B, P, 3] (used only for the AABB radii; detached)
      cov_inv6:  [B, P, 6] inverse covariance, compact symmetric layout.
      variant:   "additive" (v1) or "prob" (v2 GMM superposition).
      per_axis_radii: anisotropic AABB (localagg_prob_fast) vs isotropic.
      backend:   "xla" (chunked lax.scan), "pallas" (fused TPU kernel with
                 chunk-level AABB skipping), or "auto" (pallas on TPU).
      grid_ordered: declare that ``points`` is a raster-ordered regular
                 voxel grid (z fastest, uniform spacing, N a multiple of
                 grid.D) — enables the Pallas kernel's incremental-z
                 exponent path (~2x on its VPU-bound build). Output
                 order is unchanged. Only the caller can know this, so
                 it is opt-in (the head sets it).
    Returns:
      additive: (logits [B, N, C],)
      prob:     (logits [B, N, C], bin_logits [B, N], density [B, N])

    For the inference-only deferred-relayout variant see
    :func:`splat_deferred`.
    """
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() not in ("cpu",)
                   else "xla")
    if backend == "pallas":
        zrun = grid.D if grid_ordered else 0
        # PATCH-TILE reorder: raster tiles of `tile_n` voxels are 1-wide
        # strips in (x, y) (z fastest, then y), so a kernel tile's AABB
        # is maximally elongated and the per-(tile, chunk) skip test
        # fires rarely. Re-raster the grid into (8 x 4 x D) patches —
        # a static reshape/transpose, like the zrun permute — so each
        # 512-voxel tile is an 8x4 column block with a ~4x tighter
        # footprint. Pure reordering: results are inverse-permuted, the
        # kernel's bounds come from the permuted coords.
        patch, to_patch, from_patch = _patch_permuters(
            grid, points.shape[0], zrun, pallas_tile_n, points.shape[1])
        if patch:
            points = to_patch(points)
        outs = _splat_pallas(points, means, opacities, semantics, scales,
                             cov_inv6, grid, variant=variant,
                             per_axis_radii=per_axis_radii,
                             tile_n=pallas_tile_n, chunk_g=pallas_chunk_g,
                             zrun=zrun, interpret=interpret)
        if patch:
            outs = tuple(from_patch(o) for o in outs)
        return outs

    points = jax.lax.stop_gradient(points)
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)

    # NOTE: a python loop over the (small, static) batch — NOT jax.vmap.
    # vmap over this scan/map/remat pipeline leaks LinearizeTracers under
    # jax.grad in jax 0.9.0 (UnexpectedTracerError in the enclosing jit).
    outs = []
    for bi in range(points.shape[0]):
        outs.append(_splat_single(
            points[bi], points_int[bi], means[bi], means_int[bi],
            opacities[bi], semantics[bi], radii[bi], cov_inv6[bi],
            variant=variant, tile_n=tile_n, chunk_g=chunk_g))
    return tuple(jnp.stack([o[k] for o in outs])
                 for k in range(len(outs[0])))


# ---------------------------------------------------------------------------
# Hand-derived backward (mirrors localagg_prob/src/backward.cu:23-123):
# re-uses the forward's saved normalizers instead of re-running the whole
# forward graph under autodiff — train-step splat cost ≈ 2x forward.
# ---------------------------------------------------------------------------

def _det_grad_compact(cov6):
    """d det(A) / dA in compact-6 layout ([xx, yy, zz, xy, yz, xz]),
    including the factor 2 on off-diagonals (A symmetric)."""
    xx, yy, zz = cov6[..., 0], cov6[..., 1], cov6[..., 2]
    xy, yz, xz = cov6[..., 3], cov6[..., 4], cov6[..., 5]
    return jnp.stack([
        yy * zz - yz * yz,
        xx * zz - xz * xz,
        xx * yy - xy * xy,
        2.0 * (yz * xz - zz * xy),
        2.0 * (xy * xz - xx * yz),
        2.0 * (xy * yz - yy * xz),
    ], axis=-1)


def _splat_bwd_single(points, points_int, means, means_int, radii, cov_inv6,
                      opacities, semantics, logits, prob_sum, one_minus,
                      g_logits, g_bin, g_density, *, variant: str,
                      chunk_g: int):
    """Single-batch hand-derived backward.

    For the prob variant, per point n / gaussian g (forward.cu:74-88):
        power = exp(-1/2 d^T A d),  d = mu - x   (AABB-masked)
        w_g   = (2 pi)^-1.5 sqrt(det A) opa_g
        prob  = power w_g
        logits_c = sum_g sem_gc prob_g / prob_sum
        bin   = 1 - prod_g (1 - power_g);  density = sum_g power_g
    so (backward.cu:78-107):
        gprob[n,g]   = covered_n (g_logits[n] . sem_g - g_logits[n] .
                       logits[n]) / prob_sum_n
        gpower[n,g]  = g_density[n] + g_bin[n] (1-bin_n)/(1-power+1e-9)
                       + gprob w_g
        glogit[n,g]  = gpower power          (d exp)
        gmu_g  = -A_g (mu_g S0 - S1),  S_k = sum_n glogit x^k moments
        gA     = -1/2 d^2 moments (diag), -dx dy moments (off-diag)
                 + det-term: gw opa norm / (2 sqrt(det)) * ddet/dA
        gopa_g = gw norm sqrt(det),  gw = sum_n gprob power
        gsem   = prob^T (covered g_logits / prob_sum)

    Every reduction over n is a matmul against the 10-dim monomial
    features phi(x), so the whole backward is a scan of MXU blocks with
    the same chunking as the forward.
    """
    n = points.shape[0]
    p = means.shape[0]
    c = semantics.shape[-1]
    p_pad = -(-p // chunk_g) * chunk_g
    num_chunks = p_pad // chunk_g

    prob = variant == "prob"
    det = det_compact(cov_inv6)
    det_safe = jnp.maximum(det, 1e-30)
    sqrt_det = jnp.sqrt(det_safe)
    w_g = (_NORM_3D * sqrt_det * opacities) if prob else opacities

    covered = prob_sum > 1e-9 if prob else None
    if prob:
        inv_ps = jnp.where(covered, 1.0 / jnp.where(covered, prob_sum, 1.0),
                           0.0)
        gl = g_logits * inv_ps[:, None]               # [N, C]
        dot_gl = jnp.sum(gl * logits, axis=-1)        # [N]
        bin_term = g_bin * one_minus                  # [N]
    phi = point_features(points)                      # [N, 10]

    gdata = jnp.concatenate([means, cov_inv6], axis=-1)
    gdata = _pad_to(gdata, p_pad, 0)
    means_int_p = _pad_to(means_int, p_pad, 0, value=-(10 ** 6))
    radii_p = _pad_to(radii, p_pad, 0, value=-1)
    w_p = _pad_to(w_g, p_pad, 0)
    sem_p = _pad_to(semantics, p_pad, 0)

    chunks = (
        gdata.reshape(num_chunks, chunk_g, 9),
        means_int_p.reshape(num_chunks, chunk_g, 3),
        radii_p.reshape(num_chunks, chunk_g, 3),
        w_p.reshape(num_chunks, chunk_g),
        sem_p.reshape(num_chunks, chunk_g, c),
    )

    hi = jax.lax.Precision.HIGHEST

    @functools.partial(jax.checkpoint,
                       policy=jax.checkpoint_policies.nothing_saveable)
    def chunk_bwd(gd_j, mint_j, rad_j, w_j, sem_j):
        # recompute the power block (same math as _chunk_step)
        dx = gd_j[None, :, 0] - points[:, None, 0]
        dy = gd_j[None, :, 1] - points[:, None, 1]
        dz = gd_j[None, :, 2] - points[:, None, 2]
        logit_blk = (-0.5 * (gd_j[None, :, 3] * dx * dx
                             + gd_j[None, :, 4] * dy * dy
                             + gd_j[None, :, 5] * dz * dz)
                     - (gd_j[None, :, 6] * dx * dy
                        + gd_j[None, :, 7] * dy * dz
                        + gd_j[None, :, 8] * dx * dz))
        diff = jnp.abs(points_int[:, None, :] - mint_j[None, :, :])
        mask = jnp.all(diff <= rad_j[None, :, :], axis=-1)
        unclamped = logit_blk < 30.0
        power = jnp.exp(jnp.minimum(logit_blk, 30.0)) * mask

        if prob:
            gprob = jnp.dot(gl, sem_j.T, precision=hi,
                            preferred_element_type=jnp.float32) \
                - dot_gl[:, None]                       # [N, chunk]
            # d(prod (1-p)) guard exactly as backward.cu:96
            one_m = 1.0 - jnp.minimum(power, 1.0 - 1e-9) + 1e-9
            gpower = (g_density[:, None] + bin_term[:, None] / one_m
                      + gprob * w_j[None, :])
            gw_j = jnp.sum(gprob * power, axis=0)       # [chunk]
            prob_blk = power * w_j[None, :]
            gsem_j = jnp.dot(prob_blk.T, gl, precision=hi,
                             preferred_element_type=jnp.float32)
        else:
            gprob = jnp.dot(g_logits, sem_j.T, precision=hi,
                            preferred_element_type=jnp.float32)
            gpower = gprob * w_j[None, :]
            gw_j = jnp.sum(gprob * power, axis=0)
            gsem_j = jnp.dot((power * w_j[None, :]).T, g_logits,
                             precision=hi,
                             preferred_element_type=jnp.float32)

        glogit = gpower * power * unclamped             # [N, chunk]
        t = jnp.dot(glogit.T, phi, precision=hi,
                    preferred_element_type=jnp.float32)  # [chunk, 10]
        s2 = t[:, 0:6]     # [xx, yy, zz, xy, yz, xz] second moments
        s1 = t[:, 6:9]
        s0 = t[:, 9]

        mu = gd_j[:, 0:3]
        a6 = gd_j[:, 3:9]
        # gmu = -A (mu S0 - S1)
        v = mu * s0[:, None] - s1
        gmu = -jnp.stack([
            a6[:, 0] * v[:, 0] + a6[:, 3] * v[:, 1] + a6[:, 5] * v[:, 2],
            a6[:, 3] * v[:, 0] + a6[:, 1] * v[:, 1] + a6[:, 4] * v[:, 2],
            a6[:, 5] * v[:, 0] + a6[:, 4] * v[:, 1] + a6[:, 2] * v[:, 2],
        ], axis=-1)
        # exponent part of gA: sum_n glogit d_i d_j moments
        m0, m1, m2 = mu[:, 0], mu[:, 1], mu[:, 2]
        dd_xx = m0 * m0 * s0 - 2.0 * m0 * s1[:, 0] + s2[:, 0]
        dd_yy = m1 * m1 * s0 - 2.0 * m1 * s1[:, 1] + s2[:, 1]
        dd_zz = m2 * m2 * s0 - 2.0 * m2 * s1[:, 2] + s2[:, 2]
        dd_xy = m0 * m1 * s0 - m0 * s1[:, 1] - m1 * s1[:, 0] + s2[:, 3]
        dd_yz = m1 * m2 * s0 - m1 * s1[:, 2] - m2 * s1[:, 1] + s2[:, 4]
        dd_xz = m0 * m2 * s0 - m0 * s1[:, 2] - m2 * s1[:, 0] + s2[:, 5]
        gcov = jnp.stack([-0.5 * dd_xx, -0.5 * dd_yy, -0.5 * dd_zz,
                          -dd_xy, -dd_yz, -dd_xz], axis=-1)
        return gmu, gw_j, gsem_j, gcov

    def body(carry, chunk):
        del carry
        return 0, chunk_bwd(*chunk)

    _, (gmu, gw, gsem, gcov) = jax.lax.scan(body, 0, chunks)
    gmu = gmu.reshape(p_pad, 3)[:p]
    gw = gw.reshape(p_pad)[:p]
    gsem = gsem.reshape(p_pad, c)[:p]
    gcov = gcov.reshape(p_pad, 6)[:p]

    if prob:
        gopa = gw * _NORM_3D * sqrt_det
        # det term flows into cov_inv6 (det is of the INVERSE entries)
        gdet = jnp.where(det > 1e-30,
                         gw * opacities * _NORM_3D / (2.0 * sqrt_det), 0.0)
        gcov = gcov + gdet[:, None] * _det_grad_compact(cov_inv6)
    else:
        gopa = gw
    return gmu, gopa, gsem, gcov


def splat_backward(points, means, opacities, semantics, scales, cov_inv6,
                   grid: SplatGridSpec, residuals, cotangents, *,
                   variant: str = "prob", per_axis_radii: bool = True,
                   chunk_g: int = 512):
    """Batched hand-derived VJP. ``residuals`` = (logits, prob_sum,
    one_minus) from the forward (prob) or () (additive); ``cotangents``
    match the forward outputs. Returns grads for
    (means, opacities, semantics, cov_inv6)."""
    points = jax.lax.stop_gradient(points)
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)

    if variant == "prob":
        logits, prob_sum, one_minus = residuals
        g_logits, g_bin, g_density = cotangents
    else:
        (g_logits,) = cotangents
        b, n = points.shape[:2]
        logits = prob_sum = one_minus = None
        g_bin = g_density = jnp.zeros((b, n), jnp.float32)

    outs = []
    for bi in range(points.shape[0]):
        outs.append(_splat_bwd_single(
            points[bi], points_int[bi], means[bi], means_int[bi],
            radii[bi], cov_inv6[bi], opacities[bi], semantics[bi],
            logits[bi] if variant == "prob" else None,
            prob_sum[bi] if variant == "prob" else None,
            one_minus[bi] if variant == "prob" else None,
            g_logits[bi], g_bin[bi], g_density[bi],
            variant=variant, chunk_g=chunk_g))
    return tuple(jnp.stack([o[k] for o in outs]) for k in range(4))


# ---------------------------------------------------------------------------
# Pallas path: fused forward kernel + hand-derived backward (custom VJP).
# ---------------------------------------------------------------------------
def _labels_xla(outs, variant, emit_labels):
    """XLA twin of the Pallas kernel's label epilogue (exact head math,
    reference gaussian_head.py:165-183) for the fallback path."""
    if variant != "prob":
        return jnp.argmax(outs[0], axis=-1).astype(jnp.int32)
    logits, bins = outs[0], outs[1]
    if emit_labels["mode"] == "combine":
        comb = jnp.concatenate(
            [logits[..., :-1] * bins[..., None],
             1.0 - bins[..., None]], axis=-1)
        return jnp.argmax(comb, axis=-1).astype(jnp.int32)
    sem = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(bins > emit_labels["thresh"], sem,
                     jnp.int32(emit_labels["empty_label"]))


def _postprocess_prob(acc, one_minus, c: int):
    """(acc [N, C+2], one_minus [N]) → (logits, bin_logits, density)."""
    sem_acc = acc[:, :c]
    prob_sum = acc[:, c]
    density = acc[:, c + 1]
    covered = prob_sum > 1e-9
    denom = jnp.where(covered, prob_sum, 1.0)
    uniform = jnp.full((c,), 1.0 / (c - 1), jnp.float32).at[c - 1].set(0.0)
    logits = jnp.where(covered[:, None], sem_acc / denom[:, None],
                       uniform[None, :])
    return logits, 1.0 - one_minus, density


def _morton2(x, y):
    """Interleave the low 8 bits of two int arrays (Morton / Z-order)."""
    def spread(v):
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    return spread(x & 0xFF) | (spread(y & 0xFF) << 1)


def _pack_gaussians(points, means, opacities, semantics, scales, cov_inv6,
                    grid: SplatGridSpec, variant: str, per_axis_radii: bool):
    """Per-batch packing: phi/pts_int for points; Morton-sorted
    psi/box/sem_aug for gaussians. The Z-order sort makes every
    ``chunk_g``-sized slice spatially *compact in x AND y*, so the
    kernel's per-chunk AABB skip test (the TPU analog of the reference's
    sort-based voxel binning, aggregator_impl.cu:152-252) prunes in both
    horizontal axes instead of one."""
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)

    def pack_one(pts, pts_int, mu, mu_int, rad, opa, sem, cov6):
        order = jnp.argsort(_morton2(mu_int[:, 0], mu_int[:, 1]))
        mu, mu_int = mu[order], mu_int[order]
        rad = rad[order]
        opa, sem, cov6 = opa[order], sem[order], cov6[order]

        pts4 = jnp.concatenate(
            [pts, jnp.zeros_like(pts[:, :1])], axis=-1)
        pint = jnp.concatenate(
            [pts_int, jnp.zeros_like(pts_int[:, :1])], axis=-1)
        gdata = _pad_to(jnp.concatenate([mu, cov6], axis=-1), 16, 1)
        box = jnp.concatenate(
            [mu_int, rad, jnp.zeros_like(mu_int[:, :2])],
            axis=-1).astype(jnp.int32)
        if variant == "prob":
            det = det_compact(cov6)
            w = _NORM_3D * jnp.sqrt(jnp.maximum(det, 1e-30)) * opa
        else:
            w = opa
        sem_aug = jnp.concatenate(
            [sem * w[:, None], w[:, None], jnp.ones_like(w[:, None])],
            axis=-1)
        return pts4, pint, gdata, box, sem_aug

    return jax.vmap(pack_one)(points, points_int, means, means_int, radii,
                              opacities, semantics, cov_inv6)


def _splat_pallas_fwd_only(points, means, opacities, semantics, scales,
                           cov_inv6, grid, variant, per_axis_radii, tile_n,
                           chunk_g, interpret, with_aux: bool = False,
                           zrun: int = 0, defer_zrun: bool = False,
                           emit_labels=None):
    from .pallas.splat_kernel import splat_raw_pallas
    c = semantics.shape[-1]
    pts4, pint, gdata, box, sem_aug = _pack_gaussians(
        points, means, opacities, semantics, scales, cov_inv6, grid,
        variant, per_axis_radii)
    needs_om = variant == "prob"
    if emit_labels is not None:
        emit_labels = dict(emit_labels, c=c,
                           mode=(emit_labels["mode"] if variant == "prob"
                                 else "additive"))
    outs = []
    auxs = []
    for bi in range(points.shape[0]):
        res = splat_raw_pallas(
            pts4[bi], pint[bi], gdata[bi], box[bi], sem_aug[bi],
            tile_n=tile_n, chunk_g=chunk_g, needs_om=needs_om,
            interpret=interpret, zrun=zrun, defer_zrun=defer_zrun,
            emit_labels=emit_labels)
        acc, om = res[0], res[1]
        labels = (res[2],) if emit_labels is not None else ()
        if variant == "prob":
            outs.append(_postprocess_prob(acc, om, c) + labels)
            auxs.append((acc[:, c], om))
        else:
            outs.append((acc[:, :c],) + labels)
    result = tuple(jnp.stack([o[k] for o in outs])
                   for k in range(len(outs[0])))
    if not with_aux:
        return result
    aux = (tuple(jnp.stack([a[k] for a in auxs]) for k in range(2))
           if variant == "prob" else ())
    return result, aux


def _splat_pallas(points, means, opacities, semantics, scales, cov_inv6,
                  grid, *, variant, per_axis_radii, tile_n, chunk_g,
                  interpret, zrun: int = 0, pallas_bwd: bool = True):
    """Pallas forward with a hand-derived backward: the forward's
    normalizers (prob_sum, one_minus, logits) are saved so the backward
    is one streaming pass — no full forward recompute under autodiff
    (mirrors localagg_prob/src/backward.cu:23-123). The backward runs the
    Pallas kernel (ops/pallas/splat_bwd_kernel.py) by default, or the XLA
    chunk-scan (splat_backward) with ``pallas_bwd=False``."""

    @jax.custom_vjp
    def f(means, opacities, semantics, cov_inv6):
        return _splat_pallas_fwd_only(
            points, means, opacities, semantics, scales, cov_inv6, grid,
            variant, per_axis_radii, tile_n, chunk_g, interpret,
            zrun=zrun)

    def f_fwd(means, opacities, semantics, cov_inv6):
        outs, aux = _splat_pallas_fwd_only(
            points, means, opacities, semantics, scales, cov_inv6, grid,
            variant, per_axis_radii, tile_n, chunk_g, interpret,
            with_aux=True, zrun=zrun)
        if variant == "prob":
            logits = outs[0]
            prob_sum, one_minus = aux
            res = (means, opacities, semantics, cov_inv6,
                   (logits, prob_sum, one_minus))
        else:
            res = (means, opacities, semantics, cov_inv6, ())
        return outs, res

    def f_bwd(res, g):
        means, opacities, semantics, cov_inv6, residuals = res
        if pallas_bwd:
            return _splat_bwd_pallas_batched(
                points, means, opacities, semantics, scales, cov_inv6,
                grid, residuals, g, variant=variant,
                per_axis_radii=per_axis_radii, interpret=interpret)
        return splat_backward(
            points, means, opacities, semantics, scales, cov_inv6, grid,
            residuals, g, variant=variant, per_axis_radii=per_axis_radii)

    f.defvjp(f_fwd, f_bwd)
    return f(means, opacities, semantics, cov_inv6)


def splat_pruning_stats(points, means, scales, grid: SplatGridSpec, *,
                        per_axis_radii: bool = True, tile_n: int = 512,
                        chunk_g: int = 512):
    """Measure the Pallas kernel's chunk-skip efficiency for one batch
    element: fraction of (voxel-tile x gaussian-chunk) blocks whose AABBs
    overlap and therefore get computed. The TPU analog of the reference's
    `num_rendered` statistic (duplicateWithKeys pair count,
    aggregator_impl.cu:193-218) — log this when validating a new config's
    splat cost."""
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(means)
    radii = grid.radii(scales, per_axis=per_axis_radii)
    order = jnp.argsort(_morton2(means_int[:, 0], means_int[:, 1]))
    means_int = means_int[order]
    radii = radii[order]

    n = points.shape[0]
    p = means_int.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    p_pad = -(-p // chunk_g) * chunk_g
    pi = _pad_to(points_int, n_pad, 0, value=10 ** 6)
    lo_t = jnp.min(pi.reshape(-1, tile_n, 3), axis=1)
    hi_t = jnp.max(jnp.where(pi > 10 ** 5, -(10 ** 6), pi
                             ).reshape(-1, tile_n, 3), axis=1)
    glo = _pad_to(means_int - radii, p_pad, 0, value=10 ** 6)
    ghi = _pad_to(means_int + radii, p_pad, 0, value=-(10 ** 6))
    lo_c = jnp.min(glo.reshape(-1, chunk_g, 3), axis=1)
    hi_c = jnp.max(ghi.reshape(-1, chunk_g, 3), axis=1)
    overlap = jnp.all((lo_c[None, :] <= hi_t[:, None])
                      & (hi_c[None, :] >= lo_t[:, None]), axis=-1)
    computed = int(jnp.sum(overlap))
    total = overlap.shape[0] * overlap.shape[1]
    return {"blocks_computed": computed, "blocks_total": total,
            "fraction": computed / total,
            "pair_evals": computed * tile_n * chunk_g}


def splat_dense_reference(points, means, opacities, semantics, scales,
                          cov_inv6, grid: SplatGridSpec, *,
                          variant: str = "prob", per_axis_radii: bool = True):
    """O(N*P) dense reference implementation (for tests, small sizes only).

    Mirrors the CUDA render loops literally (localagg*/src/forward.cu).
    """
    points = jax.lax.stop_gradient(points)
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)

    d = means[:, None, :, :] - points[:, :, None, :]  # [B, N, P, 3]
    xx, yy, zz = cov_inv6[..., 0], cov_inv6[..., 1], cov_inv6[..., 2]
    xy, yz, xz = cov_inv6[..., 3], cov_inv6[..., 4], cov_inv6[..., 5]
    quad = (xx[:, None] * d[..., 0] ** 2 + yy[:, None] * d[..., 1] ** 2
            + zz[:, None] * d[..., 2] ** 2)
    power_logit = (-0.5 * quad
                   - (xy[:, None] * d[..., 0] * d[..., 1]
                      + yz[:, None] * d[..., 1] * d[..., 2]
                      + xz[:, None] * d[..., 0] * d[..., 2]))
    diff = jnp.abs(points_int[:, :, None, :] - means_int[:, None, :, :])
    mask = jnp.all(diff <= radii[:, None, :, :], axis=-1)
    power = jnp.exp(power_logit) * mask

    if variant == "additive":
        return (jnp.einsum("bnp,bpc->bnc", power * opacities[:, None, :],
                           semantics, precision=jax.lax.Precision.HIGHEST),)

    det = det_compact(cov_inv6)
    prob = power * (_NORM_3D * jnp.sqrt(det) * opacities)[:, None, :]
    sem_acc = jnp.einsum("bnp,bpc->bnc", prob, semantics,
                          precision=jax.lax.Precision.HIGHEST)
    prob_sum = prob.sum(-1)
    density = power.sum(-1)
    bin_logits = 1.0 - jnp.prod(1.0 - power, axis=-1)
    c = semantics.shape[-1]
    covered = prob_sum > 1e-9
    denom = jnp.where(covered, prob_sum, 1.0)
    uniform = jnp.full((c,), 1.0 / (c - 1), jnp.float32).at[c - 1].set(0.0)
    logits = jnp.where(covered[..., None], sem_acc / denom[..., None],
                       uniform[None, None, :])
    return logits, bin_logits, density


# ---------------------------------------------------------------------------
# Pallas backward (ops/pallas/splat_bwd_kernel.py): streamed point tiles,
# AABB-pruned blocks, in-kernel moment finalization.
# ---------------------------------------------------------------------------

def _splat_bwd_pallas_batched(points, means, opacities, semantics, scales,
                              cov_inv6, grid: SplatGridSpec, residuals,
                              cotangents, *, variant: str,
                              per_axis_radii: bool, tile_n: int = 2048,
                              chunk_g: int = 512, interpret: bool = False):
    """Hand-derived VJP on the Pallas backward kernel. Same contract as
    :func:`splat_backward` (returns grads for means/opacities/semantics/
    cov_inv6); Gaussians are Morton-sorted for chunk compactness and the
    per-Gaussian grads unsorted on the way out."""
    from .pallas.splat_bwd_kernel import splat_bwd_raw_pallas
    points = jax.lax.stop_gradient(points)
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)
    prob = variant == "prob"

    if prob:
        logits, prob_sum, one_minus = residuals
        g_logits, g_bin, g_density = cotangents
    else:
        (g_logits,) = cotangents

    outs = []
    for bi in range(points.shape[0]):
        mu_i = means[bi]
        mint_i = means_int[bi]
        order = jnp.argsort(_morton2(mint_i[:, 0], mint_i[:, 1]))
        mu = mu_i[order]
        mint = mint_i[order]
        rad = radii[bi][order]
        opa = opacities[bi][order]
        sem = semantics[bi][order]
        cov6 = cov_inv6[bi][order]

        if prob:
            det = det_compact(cov6)
            w_g = _NORM_3D * jnp.sqrt(jnp.maximum(det, 1e-30)) * opa
        else:
            w_g = opa
        p = mu.shape[0]
        gdata = jnp.concatenate(
            [mu, cov6, opa[:, None], w_g[:, None],
             jnp.zeros((p, 5), jnp.float32)], axis=-1)
        box = jnp.concatenate(
            [mint, rad, jnp.zeros((p, 2), jnp.int32)],
            axis=-1).astype(jnp.int32)
        pts4 = jnp.concatenate(
            [points[bi], jnp.zeros_like(points[bi, :, :1])], axis=-1)
        pint4 = jnp.concatenate(
            [points_int[bi], jnp.zeros_like(points_int[bi, :, :1])],
            axis=-1)

        if prob:
            covered = prob_sum[bi] > 1e-9
            inv_ps = jnp.where(covered,
                               1.0 / jnp.where(covered, prob_sum[bi], 1.0),
                               0.0)
            gl = g_logits[bi] * inv_ps[:, None]
            dot_gl = jnp.sum(gl * logits[bi], axis=-1)
            bin_term = g_bin[bi] * one_minus[bi]
            scalars = jnp.stack(
                [dot_gl, bin_term, g_density[bi],
                 jnp.zeros_like(dot_gl)], axis=-1)
        else:
            gl = g_logits[bi]
            scalars = jnp.zeros((points.shape[1], 4), jnp.float32)

        gmu_s, gopa_s, gcov_s, gsem_s = splat_bwd_raw_pallas(
            pts4, pint4, gdata, box, sem, gl, scalars, variant=variant,
            tile_n=tile_n, chunk_g=chunk_g, interpret=interpret)
        inv = jnp.argsort(order)
        outs.append((gmu_s[inv], gopa_s[inv], gsem_s[inv], gcov_s[inv]))
    return tuple(jnp.stack([o[k] for o in outs]) for k in range(4))
