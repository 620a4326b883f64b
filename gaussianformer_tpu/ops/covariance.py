"""Gaussian covariance construction and closed-form symmetric 3x3 inverse.

The reference builds Cov = (S·R)^T (S·R) and then computes the inverse with a
host round-trip (`Cov.cpu().inverse().cuda()`, reference
model/head/gaussian_head.py:119). On TPU we instead use the closed-form
adjugate inverse of the symmetric 3x3 matrix — fully on-device, fused by XLA.

The splat kernels consume the inverse covariance in the compact 6-vector
layout used by the reference CUDA kernels
(localagg*/local_aggregate*/__init__.py:158: `[0, 4, 8, 1, 5, 2]` of the
flattened 3x3) i.e. ``[ixx, iyy, izz, ixy, iyz, ixz]``.
"""
import jax.numpy as jnp

from .rotation import quaternion_to_rotation_matrix


def build_covariance(scales, rotations):
    """Cov = (S R)^T (S R) with S = diag(scales).

    scales: [..., 3], rotations: [..., 4] quaternion (w, x, y, z).
    Returns [..., 3, 3].
    """
    R = quaternion_to_rotation_matrix(rotations)
    M = scales[..., :, None] * R  # S @ R with S diagonal
    return jnp.einsum("...ki,...kj->...ij", M, M)


def symmetric_inverse_3x3(cov, eps: float = 0.0):
    """Closed-form inverse of a symmetric 3x3 matrix via the adjugate.

    cov: [..., 3, 3] symmetric. Returns [..., 3, 3].
    """
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 0, 2]
    d = cov[..., 1, 1]
    e = cov[..., 1, 2]
    f = cov[..., 2, 2]

    ca = d * f - e * e
    cb = c * e - b * f
    cc = b * e - c * d
    cd = a * f - c * c
    ce = b * c - a * e
    cf = a * d - b * b

    det = a * ca + b * cb + c * cc
    inv_det = 1.0 / (det + eps)

    row0 = jnp.stack([ca, cb, cc], axis=-1)
    row1 = jnp.stack([cb, cd, ce], axis=-1)
    row2 = jnp.stack([cc, ce, cf], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def build_covariance_inverse(scales, rotations, compact: bool = True, eps: float = 0.0):
    """Inverse covariance of a Gaussian given scales + quaternion.

    If ``compact`` returns the 6-vector ``[ixx, iyy, izz, ixy, iyz, ixz]``
    expected by the splat kernels, else the full [..., 3, 3].
    """
    cov = build_covariance(scales, rotations)
    inv = symmetric_inverse_3x3(cov, eps=eps)
    if not compact:
        return inv
    return compact_symmetric(inv)


def compact_symmetric(m):
    """[..., 3, 3] symmetric → [..., 6] as [xx, yy, zz, xy, yz, xz]."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 1, 1], m[..., 2, 2],
         m[..., 0, 1], m[..., 1, 2], m[..., 0, 2]],
        axis=-1,
    )


def build_covariance_inverse6(scales, rotations, eps: float = 0.0):
    """Compact-6 inverse covariance computed fully component-wise.

    Same math as :func:`build_covariance_inverse` (compact=True) but
    with no [..., 3, 3] intermediates: on TPU the minor-dim-3 rotation /
    covariance tensors each lower to tile-padded relayouts (~2-3 ms per
    frame in the head at flagship size); here every component is a
    full-lane [..., P] plane and the only materialization is the final
    6-column stack.
    """
    qw, qx, qy, qz = (rotations[..., 0], rotations[..., 1],
                      rotations[..., 2], rotations[..., 3])
    qn = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qi = 1.0 / jnp.maximum(qn, 1e-12)
    qw, qx, qy, qz = qw * qi, qx * qi, qy * qi, qz * qi
    ww, xx, yy, zz = qw * qw, qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    r00 = ww + xx - yy - zz
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = ww - xx + yy - zz
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = ww - xx - yy + zz

    s0 = scales[..., 0] * scales[..., 0]
    s1 = scales[..., 1] * scales[..., 1]
    s2 = scales[..., 2] * scales[..., 2]

    # Cov = (S R)^T (S R):  cov[i, j] = sum_k s_k^2 R[k, i] R[k, j]
    a = s0 * r00 * r00 + s1 * r10 * r10 + s2 * r20 * r20
    b = s0 * r00 * r01 + s1 * r10 * r11 + s2 * r20 * r21
    c = s0 * r00 * r02 + s1 * r10 * r12 + s2 * r20 * r22
    d = s0 * r01 * r01 + s1 * r11 * r11 + s2 * r21 * r21
    e = s0 * r01 * r02 + s1 * r11 * r12 + s2 * r21 * r22
    f = s0 * r02 * r02 + s1 * r12 * r12 + s2 * r22 * r22

    ca = d * f - e * e
    cb = c * e - b * f
    cc = b * e - c * d
    cd = a * f - c * c
    ce = b * c - a * e
    cf = a * d - b * b
    det = a * ca + b * cb + c * cc
    inv_det = 1.0 / (det + eps)

    # [ixx, iyy, izz, ixy, iyz, ixz]
    return jnp.stack([ca, cd, cf, cb, ce, cc], axis=-1) * inv_det[..., None]
