"""Pallas splat kernel vs the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops.splat import (SplatGridSpec, splat,
                                           splat_deferred)
from tests.test_splat import GRID, make_problem


@pytest.mark.parametrize("variant", ["additive", "prob"])
def test_pallas_matches_xla(variant):
    args = make_problem(seed=3, N=200, P=23, C=6)
    ref = splat(*args, GRID, variant=variant, backend="xla",
                tile_n=64, chunk_g=8)
    got = splat(*args, GRID, variant=variant, backend="pallas",
                pallas_tile_n=64, pallas_chunk_g=8, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_gradients_match_xla():
    args = make_problem(seed=4, N=80, P=9, C=4)
    points, means, opas, sem, scales, cov_inv = args

    def loss(backend, m, o, s, ci):
        kw = dict(interpret=True, pallas_tile_n=32, pallas_chunk_g=8) \
            if backend == "pallas" else dict(tile_n=32, chunk_g=4)
        outs = splat(points, m, o, s, scales, ci, GRID, variant="prob",
                     backend=backend, **kw)
        return sum(jnp.sum(x ** 2) for x in outs)

    g_ref = jax.grad(lambda *a: loss("xla", *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    g_pal = jax.grad(lambda *a: loss("pallas", *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    for a, b in zip(g_pal, g_ref):
        # The Pallas forward's compensated-bf16x2 semantic matmul leaves
        # ~2e-5 relative forward error (measured); the hand-VJP's saved
        # normalizers amplify that to ~1e-3 on individual gradient
        # entries. Real math bugs show up as O(1) errors.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)


def test_splat_pallas_vmem_budget_error():
    """An over-budget Gaussian table fails with the friendly error naming
    the knobs, not a Mosaic allocation crash."""
    import jax.numpy as jnp
    import pytest
    from gaussianformer_tpu.ops.pallas import splat_kernel

    p = (splat_kernel.VMEM_TABLE_BUDGET_BYTES
         // (16 * 4 + 8 * 4 + 20 * 4)) + 512
    pts = jnp.zeros((256, 4))
    pint = jnp.zeros((256, 4), jnp.int32)
    with pytest.raises(ValueError, match="num_anchor|XLA backend"):
        splat_kernel.splat_raw_pallas(
            pts, pint, jnp.zeros((p, 16)), jnp.zeros((p, 8), jnp.int32),
            jnp.zeros((p, 20)), interpret=True)


@pytest.mark.parametrize("variant", ["additive", "prob"])
def test_pallas_cover_fastpath_matches_xla(variant):
    """Huge scales make every gaussian box cover every tile, driving the
    kernel's mask-free cover branch — including a padded dummy row in the
    last chunk (P=13, chunk_g=8), which must force that chunk back onto
    the masked path (a dummy's power=1 would poison the om product)."""
    points, means, opas, sem, scales, cov_inv = make_problem(
        seed=7, N=96, P=13, C=6)
    scales = jnp.full_like(scales, 50.0)  # boxes span the whole grid
    from gaussianformer_tpu.ops.covariance import build_covariance_inverse
    import numpy as np2
    rng = np2.random.RandomState(7)
    quats = jnp.asarray(rng.randn(*means.shape[:-1], 4), jnp.float32)
    cov_inv = build_covariance_inverse(scales, quats)
    args = (points, means, opas, sem, scales, cov_inv)
    ref = splat(*args, GRID, variant=variant, backend="xla",
                tile_n=32, chunk_g=8)
    got = splat(*args, GRID, variant=variant, backend="pallas",
                pallas_tile_n=32, pallas_chunk_g=8, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("variant", ["additive", "prob"])
def test_pallas_zrun_matches_unordered(variant):
    """grid_ordered=True (the head's raster voxel grid, z fastest) drives
    the kernel's incremental-z exponent path; results must match the
    generic path on the same points, including gradients through the
    hand-derived VJP."""
    from gaussianformer_tpu.ops.splat import SplatGridSpec
    from gaussianformer_tpu.ops.covariance import build_covariance_inverse

    grid = SplatGridSpec(H=6, W=6, D=8, pc_min=(-3.0, -3.0, -2.0),
                         grid_size=0.5, scale_multiplier=4.0)
    rng = np.random.RandomState(11)
    B, P, C = 1, 13, 5
    hh, ww, dd = np.meshgrid(np.arange(grid.H), np.arange(grid.W),
                             np.arange(grid.D), indexing="ij")
    idx = np.stack([hh, ww, dd], axis=-1).reshape(1, -1, 3)  # z fastest
    points = jnp.asarray((idx + 0.5) * grid.grid_size
                         + np.array(grid.pc_min), jnp.float32)
    means = jnp.asarray(np.stack([
        rng.uniform(-2.9, 2.9, (B, P)), rng.uniform(-2.9, 2.9, (B, P)),
        rng.uniform(-1.9, 1.9, (B, P))], axis=-1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.1, 0.8, (B, P, 3)), jnp.float32)
    quats = jnp.asarray(rng.randn(B, P, 4), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.1, 1.0, (B, P)), jnp.float32)
    sem = jnp.asarray(rng.uniform(0.0, 1.0, (B, P, C)), jnp.float32)
    cov_inv = build_covariance_inverse(scales, quats)
    args = (points, means, opas, sem, scales, cov_inv)

    kw = dict(variant=variant, backend="pallas", pallas_tile_n=32,
              pallas_chunk_g=8, interpret=True)
    ref = splat(*args, grid, **kw)                       # generic path
    got = splat(*args, grid, grid_ordered=True, **kw)    # incremental-z
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def loss(ordered, m, o, s, ci):
        outs = splat(points, m, o, s, scales, ci, grid,
                     grid_ordered=ordered, **kw)
        return sum(jnp.sum(x ** 2) for x in outs)

    g_ref = jax.grad(lambda *a: loss(False, *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    g_got = jax.grad(lambda *a: loss(True, *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("variant", ["prob", "additive"])
def test_pallas_patch_tiles_match_xla(variant):
    """The 8x4xD patch-tile voxel reorder (splat wrapper) is a pure
    permutation: outputs and gradients must match the XLA backend in
    raster order."""
    from gaussianformer_tpu.ops.splat import SplatGridSpec
    from gaussianformer_tpu.ops.covariance import build_covariance_inverse

    grid = SplatGridSpec(H=16, W=8, D=8, pc_min=(-4.0, -2.0, -2.0),
                         grid_size=0.5, scale_multiplier=4.0)
    rng = np.random.RandomState(4)
    B, P, C = 1, 11, 4
    hh, ww, dd = np.meshgrid(np.arange(grid.H), np.arange(grid.W),
                             np.arange(grid.D), indexing="ij")
    idx = np.stack([hh, ww, dd], axis=-1).reshape(1, -1, 3)  # z fastest
    points = jnp.asarray((idx + 0.5) * grid.grid_size
                         + np.array(grid.pc_min), jnp.float32)
    means = jnp.asarray(np.stack([
        rng.uniform(-3.9, 3.9, (B, P)), rng.uniform(-1.9, 1.9, (B, P)),
        rng.uniform(-1.9, 1.9, (B, P))], axis=-1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.1, 0.8, (B, P, 3)), jnp.float32)
    quats = jnp.asarray(rng.randn(B, P, 4), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.1, 1.0, (B, P)), jnp.float32)
    sem = jnp.asarray(rng.uniform(0.0, 1.0, (B, P, C)), jnp.float32)
    cov_inv = build_covariance_inverse(scales, quats)
    args = (points, means, opas, sem, scales, cov_inv)

    kw = dict(variant=variant, per_axis_radii=True)
    ref = splat(*args, grid, backend="xla", **kw)
    # pallas_tile_n == 8*4*D → the patch reorder is active
    got = splat(*args, grid, backend="pallas", grid_ordered=True,
                pallas_tile_n=256, pallas_chunk_g=8, interpret=True, **kw)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def loss(backend, m, o, s, ci):
        kw2 = (dict(backend="pallas", grid_ordered=True,
                    pallas_tile_n=256, pallas_chunk_g=8, interpret=True)
               if backend == "pallas" else dict(backend="xla"))
        outs = splat(points, m, o, s, scales, ci, grid, **kw, **kw2)
        return sum(jnp.sum(x ** 2) for x in outs)

    g_ref = jax.grad(lambda *a: loss("xla", *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    g_got = jax.grad(lambda *a: loss("pallas", *a),
                     argnums=(0, 1, 2, 3))(means, opas, sem, cov_inv)
    # vs the XLA backend the tile reorder changes summation order;
    # tolerance covers the float accumulation difference
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_pallas_defer_unpatch_matches():
    """splat_deferred returns kernel-order rows + an unpatch callable
    whose composition reproduces the eager (voxel-order) outputs, for
    both [B, N, C] and flat [B, N] tensors (the head defers the voxel
    relayout past its elementwise logits/argmax math at inference)."""
    from gaussianformer_tpu.ops.covariance import build_covariance_inverse

    grid = SplatGridSpec(H=16, W=8, D=8, pc_min=(-4.0, -2.0, -2.0),
                         grid_size=0.5, scale_multiplier=4.0)
    rng = np.random.RandomState(7)
    B, P, C = 1, 9, 5
    hh, ww, dd = np.meshgrid(np.arange(grid.H), np.arange(grid.W),
                             np.arange(grid.D), indexing="ij")
    idx = np.stack([hh, ww, dd], axis=-1).reshape(1, -1, 3)
    points = jnp.asarray((idx + 0.5) * grid.grid_size
                         + np.array(grid.pc_min), jnp.float32)
    means = jnp.asarray(np.stack([
        rng.uniform(-3.9, 3.9, (B, P)), rng.uniform(-1.9, 1.9, (B, P)),
        rng.uniform(-1.9, 1.9, (B, P))], axis=-1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.1, 0.8, (B, P, 3)), jnp.float32)
    quats = jnp.asarray(rng.randn(B, P, 4), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.1, 1.0, (B, P)), jnp.float32)
    sem = jnp.asarray(rng.uniform(0.0, 1.0, (B, P, C)), jnp.float32)
    cov_inv = build_covariance_inverse(scales, quats)
    args = (points, means, opas, sem, scales, cov_inv)

    kw = dict(variant="prob", per_axis_radii=True, backend="pallas",
              grid_ordered=True, pallas_tile_n=256, pallas_chunk_g=8,
              interpret=True)
    eager = splat(*args, grid, **kw)
    deferred, unpatch = splat_deferred(*args, grid, **kw)
    for a, b in zip(deferred, eager):
        np.testing.assert_allclose(np.asarray(unpatch(a)), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # argmax commutes with the row permutation
    lbl_k = jnp.argmax(deferred[0], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(unpatch(lbl_k)),
        np.asarray(jnp.argmax(eager[0], axis=-1)))
    # identity fallback when the patch path is ineligible (xla backend)
    outs2, ident = splat_deferred(*args, grid, variant="prob",
                                  backend="xla")
    for a, b in zip(outs2, splat(*args, grid, variant="prob",
                                 backend="xla")):
        np.testing.assert_allclose(np.asarray(ident(a)), np.asarray(b))


def test_label_epilogue_matches_head_math():
    """The kernel's in-VMEM final-occ label epilogue must reproduce the
    head's XLA chain (normalize w/ uniform fallback -> combine_geosem or
    bin-threshold -> first-index argmax) exactly, for both prob modes
    and the additive variant."""
    import numpy as np
    import jax.numpy as jnp
    from gaussianformer_tpu.ops.splat import (splat, splat_deferred,
                                              SplatGridSpec)

    rs = np.random.RandomState(11)
    grid = SplatGridSpec(H=16, W=16, D=8, pc_min=(-8.0, -8.0, -4.0),
                         grid_size=1.0, scale_multiplier=4.0)
    B, P, C, N = 1, 64, 6, 16 * 16 * 8
    xs = (np.arange(16) + 0.5) - 8.0
    zs = (np.arange(8) + 0.5) - 4.0
    pts = np.stack(np.meshgrid(xs, xs, zs, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    points = jnp.asarray(pts, jnp.float32)[None]
    means = jnp.asarray(rs.uniform(-7, 7, (B, P, 3)), jnp.float32)
    opa = jnp.asarray(rs.rand(B, P), jnp.float32)
    sem = jnp.asarray(rs.rand(B, P, C), jnp.float32)
    scales = jnp.asarray(rs.uniform(0.3, 1.5, (B, P, 3)), jnp.float32)
    rot = np.zeros((B, P, 3, 3)) + np.eye(3)
    s2 = 1.0 / np.asarray(scales) ** 2
    ci = np.einsum("bpij,bpj,bpkj->bpik", rot, s2, rot)
    cov_inv6 = jnp.asarray(np.stack(
        [ci[..., 0, 0], ci[..., 1, 1], ci[..., 2, 2],
         ci[..., 0, 1], ci[..., 1, 2], ci[..., 0, 2]], -1), jnp.float32)

    kw = dict(grid_ordered=True, interpret=True, pallas_tile_n=128,
              pallas_chunk_g=32)
    for variant, mode in (("prob", "combine"), ("prob", "threshold"),
                          ("additive", "combine")):
        emit = dict(mode=mode, thresh=0.35, empty_label=C - 1)
        (outs, unpatch) = splat_deferred(
            points, means, opa, sem, scales, cov_inv6, grid,
            variant=variant, backend="pallas", emit_labels=emit, **kw)
        labels = np.asarray(unpatch(outs[-1]))
        ref = splat(points, means, opa, sem, scales, cov_inv6, grid,
                    variant=variant, backend="pallas", **kw)
        if variant == "prob":
            logits, bins = np.asarray(ref[0]), np.asarray(ref[1])
            if mode == "combine":
                comb = np.concatenate(
                    [logits[..., :-1] * bins[..., None],
                     1.0 - bins[..., None]], -1)
                want = comb.argmax(-1)
            else:
                want = np.where(bins > 0.35, logits.argmax(-1), C - 1)
        else:
            want = np.asarray(ref[0]).argmax(-1)
        np.testing.assert_array_equal(labels, want,
                                      err_msg=f"{variant}/{mode}")
