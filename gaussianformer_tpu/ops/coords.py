"""Coordinate (de)normalization between anchor space and world space.

Behavioral parity with reference model/encoder/gaussian_encoder/utils.py:7-52
(`cartesian`, `reverse_cartesian`, `spherical2cartesian`).
"""
import jax.numpy as jnp

from .safe_ops import safe_sigmoid, safe_inverse_sigmoid


def cartesian(anchor_xyz, pc_range, use_sigmoid: bool = True):
    """Anchor-space xyz (logits or unit cube) → world-space xyz."""
    if use_sigmoid:
        xyz = safe_sigmoid(anchor_xyz)
    else:
        xyz = jnp.clip(anchor_xyz, 1e-6, 1.0 - 1e-6)
    lo = jnp.asarray(pc_range[:3], dtype=xyz.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=xyz.dtype)
    return xyz * (hi - lo) + lo


def reverse_cartesian(xyz, pc_range, use_sigmoid: bool = True):
    """World-space xyz → anchor space (inverse of :func:`cartesian`)."""
    lo = jnp.asarray(pc_range[:3], dtype=xyz.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=xyz.dtype)
    unit = (xyz - lo) / (hi - lo)
    if use_sigmoid:
        return safe_inverse_sigmoid(unit)
    return jnp.clip(unit, 1e-6, 1.0 - 1e-6)


def spherical_to_cartesian(anchor, pc_range, phi_activation: str = "loop"):
    """Polar anchor parameterization (r, theta, phi) → cartesian xyz."""
    if phi_activation == "sigmoid":
        xyz = safe_sigmoid(anchor[..., :3])
    elif phi_activation == "loop":
        xy = safe_sigmoid(anchor[..., :2])
        z = jnp.remainder(anchor[..., 2:3], 1.0)
        xyz = jnp.concatenate([xy, z], axis=-1)
    else:
        raise NotImplementedError(phi_activation)
    r = xyz[..., 0] * (pc_range[3] - pc_range[0]) + pc_range[0]
    theta = xyz[..., 1] * (pc_range[4] - pc_range[1]) + pc_range[1]
    phi = xyz[..., 2] * (pc_range[5] - pc_range[2]) + pc_range[2]
    x = r * jnp.sin(theta) * jnp.cos(phi)
    y = r * jnp.sin(theta) * jnp.sin(phi)
    z = r * jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)
