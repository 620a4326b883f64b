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


def _chunk_step(phi, pts_int, psi, means_int, radii, opa_norm, opa, sem,
                variant: str):
    """Dense computation for one (voxel-tile, gaussian-chunk) block.

    phi:       [Nt, 10] float point features
    pts_int:   [Nt, 3]  int voxel coords
    psi:       [Pc, 10] gaussian coefficients
    means_int: [Pc, 3]  int voxel coords of means
    radii:     [Pc, 3]  int AABB radii (already broadcast per-axis)
    opa_norm:  [Pc]     (2pi)^-1.5 sqrt(det A) * opa  (prob) — unused additive
    opa:       [Pc]     raw opacity
    sem:       [Pc, C]

    Returns per-block partial outputs (to be accumulated / multiplied).
    """
    power_logit = jnp.dot(phi, psi.T, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    # AABB mask: |pt_int - mean_int| <= radii, per axis (getRect semantics).
    diff = jnp.abs(pts_int[:, None, :] - means_int[None, :, :])
    mask = jnp.all(diff <= radii[None, :, :], axis=-1)
    power = jnp.exp(jnp.minimum(power_logit, 0.0)) * mask

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
    one_minus = jnp.prod(1.0 - power, axis=-1)
    return sem_acc, prob_sum, density, one_minus


def _splat_single(points, points_int, means, means_int, opacities, semantics,
                  radii, cov_inv6, *, variant: str, tile_n: int, chunk_g: int,
                  remat: bool = True):
    """Single-batch splat. points [N,3], means [P,3], semantics [P,C]."""
    n = points.shape[0]
    p = means.shape[0]
    c = semantics.shape[-1]

    n_pad = -(-n // tile_n) * tile_n
    p_pad = -(-p // chunk_g) * chunk_g

    phi = point_features(points)
    psi = gaussian_coefficients(means, cov_inv6)
    det = det_compact(cov_inv6)
    # guard: dummy/degenerate gaussians get det clamped to keep sqrt finite
    opa_norm = _NORM_3D * jnp.sqrt(jnp.maximum(det, 1e-30)) * opacities

    phi = _pad_to(phi, n_pad, 0)
    pts_int = _pad_to(points_int, n_pad, 0, value=-(10 ** 6))
    psi = _pad_to(psi, p_pad, 0)
    means_int = _pad_to(means_int, p_pad, 0, value=-(10 ** 6))
    radii_p = _pad_to(radii, p_pad, 0, value=-1)
    opa_norm = _pad_to(opa_norm, p_pad, 0)
    opa = _pad_to(opacities, p_pad, 0)
    sem = _pad_to(semantics, p_pad, 0)

    num_tiles = n_pad // tile_n
    num_chunks = p_pad // chunk_g

    phi_t = phi.reshape(num_tiles, tile_n, 10)
    pts_int_t = pts_int.reshape(num_tiles, tile_n, 3)
    psi_c = psi.reshape(num_chunks, chunk_g, 10)
    means_int_c = means_int.reshape(num_chunks, chunk_g, 3)
    radii_c = radii_p.reshape(num_chunks, chunk_g, 3)
    opa_norm_c = opa_norm.reshape(num_chunks, chunk_g)
    opa_c = opa.reshape(num_chunks, chunk_g)
    sem_c = sem.reshape(num_chunks, chunk_g, c)

    step = _chunk_step
    if remat:
        step = jax.checkpoint(
            functools.partial(_chunk_step, variant=variant),
            policy=jax.checkpoint_policies.nothing_saveable)
    else:
        step = functools.partial(_chunk_step, variant=variant)

    def tile_fn(tile):
        phi_i, pts_int_i = tile

        def scan_body(carry, chunk):
            psi_j, mint_j, rad_j, onorm_j, opa_j, sem_j = chunk
            sem_acc, prob_sum, density, one_minus = step(
                phi_i, pts_int_i, psi_j, mint_j, rad_j, onorm_j, opa_j, sem_j)
            if variant == "additive":
                return (carry[0] + sem_acc,), None
            return (carry[0] + sem_acc, carry[1] + prob_sum,
                    carry[2] + density, carry[3] * one_minus), None

        if variant == "additive":
            init = (jnp.zeros((tile_n, c), jnp.float32),)
        else:
            init = (jnp.zeros((tile_n, c), jnp.float32),
                    jnp.zeros((tile_n,), jnp.float32),
                    jnp.zeros((tile_n,), jnp.float32),
                    jnp.ones((tile_n,), jnp.float32))
        carry, _ = jax.lax.scan(
            scan_body, init,
            (psi_c, means_int_c, radii_c, opa_norm_c, opa_c, sem_c))
        return carry

    out = jax.lax.map(tile_fn, (phi_t, pts_int_t))

    if variant == "additive":
        return (out[0].reshape(n_pad, c)[:n],)

    sem_acc = out[0].reshape(n_pad, c)[:n]
    prob_sum = out[1].reshape(n_pad)[:n]
    density = out[2].reshape(n_pad)[:n]
    one_minus = out[3].reshape(n_pad)[:n]

    # GMM posterior with uniform fallback (forward.cu:92-98): when no Gaussian
    # covers the point, the first C-1 channels get 1/(C-1) and the last stays 0.
    covered = prob_sum > 1e-9
    denom = jnp.where(covered, prob_sum, 1.0)
    uniform = jnp.full((c,), 1.0 / (c - 1), jnp.float32).at[c - 1].set(0.0)
    logits = jnp.where(covered[:, None], sem_acc / denom[:, None],
                       uniform[None, :])
    bin_logits = 1.0 - one_minus
    return logits, bin_logits, density


def splat(points, means, opacities, semantics, scales, cov_inv6,
          grid: SplatGridSpec, *, variant: str = "prob",
          per_axis_radii: bool = True, tile_n: int = 8192,
          chunk_g: int = 512):
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

    Returns:
      additive: (logits [B, N, C],)
      prob:     (logits [B, N, C], bin_logits [B, N], density [B, N])
    """
    points = jax.lax.stop_gradient(points)
    points_int = grid.voxelize(points)
    means_int = grid.voxelize(jax.lax.stop_gradient(means))
    radii = grid.radii(scales, per_axis=per_axis_radii)

    fn = functools.partial(
        _splat_single, variant=variant, tile_n=tile_n, chunk_g=chunk_g)
    return jax.vmap(fn)(points, points_int, means, means_int, opacities,
                        semantics, radii, cov_inv6)


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
