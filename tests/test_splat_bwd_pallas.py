"""Pallas splat backward kernel vs the XLA hand-derived VJP.

The XLA backward (ops/splat.splat_backward) is verified against autodiff
in tests/test_splat_backward.py; matching it block-for-block extends the
chain to the streamed Pallas kernel (ops/pallas/splat_bwd_kernel.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops.splat import SplatGridSpec, _splat_pallas

GRID = SplatGridSpec(H=10, W=10, D=4, pc_min=(-5.0, -5.0, -2.0),
                     grid_size=1.0, scale_multiplier=2.0)


def _inputs(seed=0, b=1, n=300, p=40, c=5):
    rng = np.random.RandomState(seed)
    points = jnp.asarray(rng.uniform(-5, 5, (b, n, 3)), jnp.float32)
    means = jnp.asarray(rng.uniform(-4, 4, (b, p, 3)), jnp.float32)
    opa = jnp.asarray(rng.uniform(0.2, 1.0, (b, p)), jnp.float32)
    sem = jnp.asarray(rng.uniform(0, 1, (b, p, c)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.5, 2.0, (b, p, 3)), jnp.float32)
    # SPD inverse covariances via A = L L^T + eps I
    l = rng.randn(b, p, 3, 3) * 0.3
    a = np.einsum("bpij,bpkj->bpik", l, l) + np.eye(3) * 0.5
    cov6 = jnp.asarray(
        np.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2],
                  a[..., 0, 1], a[..., 1, 2], a[..., 0, 2]], -1),
        jnp.float32)
    return points, means, opa, sem, scales, cov6


@pytest.mark.parametrize("variant", ["prob", "additive"])
def test_pallas_bwd_matches_xla_bwd(variant):
    points, means, opa, sem, scales, cov6 = _inputs()

    def run(pallas_bwd):
        def loss(means, opa, sem, cov6):
            outs = _splat_pallas(
                points, means, opa, sem, scales, cov6, GRID,
                variant=variant, per_axis_radii=True, tile_n=128,
                chunk_g=16, interpret=True, pallas_bwd=pallas_bwd)
            total = jnp.sum(outs[0] * jnp.cos(jnp.arange(outs[0].size)
                                              .reshape(outs[0].shape)))
            if variant == "prob":
                total = total + jnp.sum(outs[1] * 0.5) + \
                    jnp.sum(outs[2] * 0.25)
            return total
        return jax.grad(loss, argnums=(0, 1, 2, 3))(means, opa, sem, cov6)

    g_xla = run(False)
    g_pal = run(True)
    names = ["means", "opacities", "semantics", "cov_inv6"]
    for name, gx, gp in zip(names, g_xla, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name} ({variant})")
