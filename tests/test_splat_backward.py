"""Hand-derived splat VJP (ops/splat.splat_backward, mirroring
localagg_prob/src/backward.cu:23-123) vs autodiff of the XLA path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianformer_tpu.ops.splat import (SplatGridSpec, splat,
                                          splat_backward)


def make_inputs(seed=0, b=2, n=60, p=12, c=5):
    rng = np.random.RandomState(seed)
    grid = SplatGridSpec(H=6, W=6, D=4, pc_min=(0.0, 0.0, 0.0),
                         grid_size=1.0, scale_multiplier=4.0)
    pts = jnp.asarray(rng.uniform(0, [6, 6, 4], (b, n, 3)), jnp.float32)
    means = jnp.asarray(rng.uniform(0.5, [5.5, 5.5, 3.5], (b, p, 3)),
                        jnp.float32)
    scales = jnp.asarray(rng.uniform(0.3, 0.9, (b, p, 3)), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.2, 0.9, (b, p)), jnp.float32)
    sem = jnp.asarray(rng.rand(b, p, c), jnp.float32)
    a = rng.randn(b, p, 3, 3).astype(np.float32) * 0.4
    spd = np.einsum("bpij,bpkj->bpik", a, a) + np.eye(3)[None, None] * 0.6
    cov6 = jnp.asarray(np.stack(
        [spd[..., 0, 0], spd[..., 1, 1], spd[..., 2, 2],
         spd[..., 0, 1], spd[..., 1, 2], spd[..., 0, 2]], -1), jnp.float32)
    return grid, pts, means, opas, sem, scales, cov6


@pytest.mark.parametrize("variant", ["prob", "additive"])
def test_hand_backward_matches_autodiff(variant):
    grid, pts, means, opas, sem, scales, cov6 = make_inputs()

    def fwd(means, opas, sem, cov6):
        return splat(pts, means, opas, sem, scales, cov6, grid,
                     variant=variant, per_axis_radii=True, backend="xla",
                     chunk_g=4)

    outs, vjp = jax.vjp(fwd, means, opas, sem, cov6)
    rng = np.random.RandomState(1)
    cots = tuple(jnp.asarray(rng.randn(*o.shape), jnp.float32)
                 for o in outs)
    want = vjp(cots)

    if variant == "prob":
        logits, bins, dens = outs
        residuals = (logits, jax.lax.stop_gradient(
            _prob_sum(pts, means, opas, sem, scales, cov6, grid)),
            1.0 - bins)
    else:
        residuals = ()
    got = splat_backward(pts, means, opas, sem, scales, cov6, grid,
                         residuals, cots, variant=variant,
                         per_axis_radii=True, chunk_g=4)

    names = ["means", "opacities", "semantics", "cov_inv6"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch for {name} ({variant})")


def _prob_sum(pts, means, opas, sem, scales, cov6, grid):
    """Recompute the forward's prob_sum normalizer (saved by the Pallas
    path's f_fwd; the XLA path doesn't expose it)."""
    from gaussianformer_tpu.ops.splat import (det_compact, _NORM_3D)
    pts_int = grid.voxelize(pts)
    means_int = grid.voxelize(means)
    radii = grid.radii(scales, per_axis=True)
    d = means[:, None, :, :] - pts[:, :, None, :]
    xx, yy, zz = cov6[..., 0], cov6[..., 1], cov6[..., 2]
    xy, yz, xz = cov6[..., 3], cov6[..., 4], cov6[..., 5]
    logit = (-0.5 * (xx[:, None] * d[..., 0] ** 2
                     + yy[:, None] * d[..., 1] ** 2
                     + zz[:, None] * d[..., 2] ** 2)
             - (xy[:, None] * d[..., 0] * d[..., 1]
                + yz[:, None] * d[..., 1] * d[..., 2]
                + xz[:, None] * d[..., 0] * d[..., 2]))
    mask = jnp.all(jnp.abs(pts_int[:, :, None] - means_int[:, None])
                   <= radii[:, None], axis=-1)
    power = jnp.exp(logit) * mask
    det = det_compact(cov6)
    return jnp.sum(power * (_NORM_3D * jnp.sqrt(det) * opas)[:, None],
                   axis=-1)


def test_pallas_custom_vjp_grads_cpu_interpret():
    """End-to-end: grads through the Pallas splat wrapper (interpret mode
    on CPU) match the XLA path's autodiff."""
    grid, pts, means, opas, sem, scales, cov6 = make_inputs(b=1, n=40, p=8)

    def loss_pallas(means, opas, sem, cov6):
        outs = splat(pts, means, opas, sem, scales, cov6, grid,
                     variant="prob", per_axis_radii=True,
                     backend="pallas", pallas_tile_n=64,
                     pallas_chunk_g=8, interpret=True)
        return (jnp.sum(outs[0] * outs[0]) + jnp.sum(outs[1])
                + 0.1 * jnp.sum(outs[2]))

    def loss_xla(means, opas, sem, cov6):
        outs = splat(pts, means, opas, sem, scales, cov6, grid,
                     variant="prob", per_axis_radii=True, backend="xla",
                     chunk_g=4)
        return (jnp.sum(outs[0] * outs[0]) + jnp.sum(outs[1])
                + 0.1 * jnp.sum(outs[2]))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(means, opas, sem,
                                                     cov6)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(means, opas, sem, cov6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)
