import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops import (
    safe_sigmoid, safe_inverse_sigmoid,
    quaternion_to_rotation_matrix,
    build_covariance, build_covariance_inverse, symmetric_inverse_3x3,
    cartesian, reverse_cartesian,
)
from gaussianformer_tpu.ops.covariance import compact_symmetric


def test_safe_sigmoid_roundtrip():
    x = jnp.linspace(0.01, 0.99, 17)
    y = safe_sigmoid(safe_inverse_sigmoid(x))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_safe_sigmoid_clamps():
    assert float(safe_sigmoid(jnp.array(100.0))) == pytest.approx(
        1.0 / (1.0 + np.exp(-9.21)))
    assert float(safe_inverse_sigmoid(jnp.array(1.0))) == pytest.approx(
        np.log(0.9999 / 0.0001), rel=1e-3)


def test_quaternion_identity():
    r = quaternion_to_rotation_matrix(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_quaternion_90deg_z():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    r = quaternion_to_rotation_matrix(jnp.array([s, 0.0, 0.0, s]))
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_quaternion_rotation_properties():
    rng = np.random.RandomState(0)
    q = rng.randn(32, 4).astype(np.float32)
    r = quaternion_to_rotation_matrix(jnp.asarray(q))
    eye = jnp.einsum("...ij,...kj->...ik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_symmetric_inverse_matches_linalg():
    rng = np.random.RandomState(1)
    scales = rng.uniform(0.2, 2.0, (16, 3)).astype(np.float32)
    quats = rng.randn(16, 4).astype(np.float32)
    cov = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    inv = symmetric_inverse_3x3(cov)
    np.testing.assert_allclose(
        np.asarray(inv), np.linalg.inv(np.asarray(cov)), rtol=2e-3, atol=1e-4)


def test_build_covariance_inverse_compact_layout():
    rng = np.random.RandomState(2)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (4, 3)).astype(np.float32))
    quats = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    full = build_covariance_inverse(scales, quats, compact=False)
    comp = build_covariance_inverse(scales, quats, compact=True)
    np.testing.assert_allclose(comp, compact_symmetric(full), atol=1e-6)
    # layout: [xx, yy, zz, xy, yz, xz] — the reference's [0, 4, 8, 1, 5, 2]
    flat = np.asarray(full).reshape(4, 9)
    np.testing.assert_allclose(comp, flat[:, [0, 4, 8, 1, 5, 2]], atol=1e-6)


def test_cartesian_roundtrip():
    pc_range = [-50.0, -50.0, -5.0, 50.0, 50.0, 3.0]
    rng = np.random.RandomState(3)
    anchor = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    xyz = cartesian(anchor, pc_range)
    assert xyz[..., 2].min() >= -5.0 and xyz[..., 2].max() <= 3.0
    back = reverse_cartesian(xyz, pc_range)
    np.testing.assert_allclose(back, np.clip(anchor, -9.2, 9.2), atol=1e-3)


def test_covariance_inverse6_matches_matrix_path():
    """Component-wise compact-6 inverse covariance == the [...,3,3]
    adjugate path."""
    import jax.numpy as jnp
    from gaussianformer_tpu.ops.covariance import (
        build_covariance_inverse, build_covariance_inverse6)

    rng = np.random.RandomState(2)
    scales = jnp.asarray(rng.rand(2, 33, 3) * 2 + 0.05, jnp.float32)
    quats = jnp.asarray(rng.randn(2, 33, 4), jnp.float32)
    want = build_covariance_inverse(scales, quats, compact=True)
    got = build_covariance_inverse6(scales, quats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_compact_indices_matches_argsort():
    import jax.numpy as jnp
    from gaussianformer_tpu.ops.compaction import compact_indices

    rng = np.random.RandomState(5)
    mask = jnp.asarray(rng.rand(1300) > 0.7)
    got = compact_indices(mask, 1300)
    order = np.argsort(~np.asarray(mask), kind="stable")
    count = int(np.asarray(mask).sum())
    np.testing.assert_array_equal(np.asarray(got)[:count], order[:count])
