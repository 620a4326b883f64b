"""Quaternion → rotation matrix.

Matches the convention of the reference's quaternion-product-matrix
construction (reference: model/utils/utils.py:20-69): the quaternion is
L2-normalized, and the resulting matrix R satisfies
``R = mat1 @ conj(mat2)^T`` restricted to the vector part — i.e. the
standard (w, x, y, z) right-handed rotation matrix.
"""
import jax.numpy as jnp


def quaternion_to_rotation_matrix(quat, eps: float = 1e-12):
    """[..., 4] (w, x, y, z) → [..., 3, 3] rotation matrix.

    The quaternion is normalized internally (matching F.normalize in the
    reference). Note the reference composes two quaternion product
    matrices, which for a unit quaternion reduces to the closed form below.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    quat = quat / jnp.maximum(norm, eps)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]

    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    r00 = ww + xx - yy - zz
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = ww - xx + yy - zz
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = ww - xx - yy + zz

    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
