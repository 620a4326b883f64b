"""Gaussian occupancy head: splat refined Gaussians to the voxel grid.

Capability parity with the reference GaussianHead
(model/head/gaussian_head.py:10-197):
  - selects which refine layers to supervise (all / random_k / fixed);
  - builds covariance inverses fully on device (the reference does a CPU
    round-trip, gaussian_head.py:119 — here a closed-form symmetric
    inverse);
  - `with_empty`: appends one large background Gaussian carrying the empty
    class with a learnable logit scalar;
  - prob path: softmax semantics + zero-padded empty channel, GMM splat
    (bin_logits / density), then either `combine_geosem` or
    argmax+threshold post-processing.

Constraint: with ``training=False`` the (non-sharded) splat runs through
the forward-only deferred-unpatch path, which bypasses the custom-VJP
wrapper — an eval-mode forward is NOT differentiable on the pallas
backend. Input-sensitivity / eval-time-grad studies must call with
``training=True`` (and pass ``apply_loss_layers=[num_decoder-1]`` to keep
eval layer selection).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.covariance import build_covariance_inverse6
from ...ops.splat import SplatGridSpec, splat, splat_deferred
from ..encoder.modules import GaussianPrediction


class GaussianHead(nn.Module):
    apply_loss_type: str = "random_1"
    num_classes: int = 18
    empty_label: int = 17
    with_empty: bool = False
    empty_mean: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    empty_scale: Tuple[float, float, float] = (100.0, 100.0, 8.0)
    use_localaggprob: bool = True
    combine_geosem: bool = True
    dataset_type: str = "nusc"
    grid: SplatGridSpec = SplatGridSpec()
    per_axis_radii: bool = False
    sigmoid_thresh: float = 0.5
    splat_tile_n: int = 8192
    splat_chunk_g: int = 512
    # voxel (spatial) parallelism: when the ambient jax mesh has this
    # axis with size > 1 (jax.sharding.use_abstract_mesh at the jit call
    # site), the splat runs under shard_map with query voxels sharded
    # along it — Gaussians replicated, no collectives in the forward,
    # gradient psum inserted by shard_map's transpose.
    voxel_shard_axis: Optional[str] = "model"

    def prepare_gaussian_args(self, gaussians: GaussianPrediction):
        means = gaussians.means
        scales = gaussians.scales
        rotations = gaussians.rotations
        opacities = gaussians.semantics  # semantics drive the channels
        origi_opa = gaussians.opacities
        if origi_opa.shape[-1] == 0:
            origi_opa = jnp.ones_like(opacities[..., :1])

        if self.with_empty:
            empty_scalar = self.param(
                "empty_scalar", nn.initializers.constant(10.0), (1,))
            b = means.shape[0]
            # non-empty gaussians get a zero logit on the empty channel
            if "kitti" in self.dataset_type:
                opacities = jnp.concatenate(
                    [jnp.zeros_like(opacities[..., :1]), opacities], axis=-1)
            else:
                opacities = jnp.concatenate(
                    [opacities, jnp.zeros_like(opacities[..., :1])], axis=-1)
            e_mean = jnp.broadcast_to(
                jnp.asarray(self.empty_mean, jnp.float32), (b, 1, 3))
            e_scale = jnp.broadcast_to(
                jnp.asarray(self.empty_scale, jnp.float32), (b, 1, 3))
            e_rot = jnp.broadcast_to(
                jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (b, 1, 4))
            e_sem = jnp.zeros((b, 1, self.num_classes), jnp.float32)
            e_sem = e_sem.at[..., self.empty_label].add(empty_scalar[0])
            means = jnp.concatenate([means, e_mean], axis=1)
            scales = jnp.concatenate([scales, e_scale], axis=1)
            rotations = jnp.concatenate([rotations, e_rot], axis=1)
            opacities = jnp.concatenate([opacities, e_sem], axis=1)
            origi_opa = jnp.concatenate(
                [origi_opa, jnp.ones((b, 1, 1), jnp.float32)], axis=1)
        elif self.use_localaggprob:
            opacities = jax.nn.softmax(opacities, axis=-1)
            if "kitti" in self.dataset_type:
                opacities = jnp.concatenate(
                    [jnp.zeros_like(opacities[..., :1]), opacities], axis=-1)
            else:
                opacities = jnp.concatenate(
                    [opacities, jnp.zeros_like(opacities[..., :1])], axis=-1)

        cov_inv6 = build_covariance_inverse6(scales, rotations)
        return means, origi_opa[..., 0], opacities, scales, cov_inv6

    @nn.compact
    def __call__(self, representation: Sequence[GaussianPrediction],
                 occ_xyz, occ_label, occ_cam_mask, *,
                 training: bool = False, rng: Optional[jax.Array] = None,
                 apply_loss_layers: Optional[Sequence[int]] = None):
        """occ_xyz: [B, X, Y, Z, 3]; occ_label: [B, X, Y, Z];
        occ_cam_mask: [B, X, Y, Z] bool.

        ``apply_loss_layers`` (static python list) lets the train loop pick
        the supervised layers on host — the parity path for `random_k`
        with k > 1 (reference draws with np.random.choice on host too,
        gaussian_head.py:133-137)."""
        num_decoder = len(representation)
        b = occ_xyz.shape[0]
        sampled_xyz = occ_xyz.reshape(b, -1, 3)
        sampled_label = occ_label.reshape(b, -1)

        if apply_loss_layers is not None:
            apply_loss_layers = list(apply_loss_layers)
        elif not training:
            apply_loss_layers = [num_decoder - 1]
        elif self.apply_loss_type == "all":
            apply_loss_layers = list(range(num_decoder))
        elif self.apply_loss_type.startswith("random"):
            k = int(self.apply_loss_type.split("_")[1])
            if k > 1:
                # The reference draws the supervised-layer subset on host
                # with np.random.choice (gaussian_head.py:133-137); the
                # static-shape parity path is a host draw passed in as
                # ``apply_loss_layers`` (Trainer._draw_loss_layers). A
                # silent in-jit approximation (e.g. "last k layers")
                # would change which layers are supervised without any
                # signal — refuse instead.
                raise ValueError(
                    f"apply_loss_type={self.apply_loss_type!r} with k>1 "
                    "needs the supervised layers drawn on host: pass "
                    "apply_loss_layers=<tuple of layer indices> (see "
                    "Trainer._draw_loss_layers for the parity draw).")
            else:
                apply_loss_layers = [num_decoder - 1]
        elif self.apply_loss_type.startswith("fixed"):
            apply_loss_layers = [
                int(s) for s in self.apply_loss_type.split("_")[1:]]
        else:
            raise NotImplementedError(self.apply_loss_type)

        splat_kw = dict(
            variant="prob" if self.use_localaggprob else "additive",
            per_axis_radii=self.per_axis_radii,
            tile_n=self.splat_tile_n, chunk_g=self.splat_chunk_g,
            # occ_xyz is the raster voxel grid (z fastest) — enables
            # the Pallas incremental-z exponent path
            grid_ordered=(occ_xyz.shape[3] == self.grid.D))

        # voxel-sharded splat (see voxel_shard_axis): activates only
        # when the caller established an ambient mesh carrying the axis
        am = jax.sharding.get_abstract_mesh()
        ax = self.voxel_shard_axis
        shard_vox = (
            ax is not None and am is not None
            and ax in (getattr(am, "axis_names", ()) or ())
            and am.shape[ax] > 1
            and sampled_xyz.shape[1] % am.shape[ax] == 0)
        if shard_vox:
            from jax.sharding import PartitionSpec as PS
            n_outs = 3 if self.use_localaggprob else 1
            data_ax = "data" if "data" in am.axis_names else None

            def _splat_shard(pts, m_, o_, s_, sc_, ci_):
                return splat(pts, m_, o_, s_, sc_, ci_, self.grid,
                             **splat_kw)

            # check_vma off: the XLA chunk-scan twin carries replicated
            # zero-initialized accumulators whose varying-axis types the
            # static checker cannot reconcile; correctness (incl. the
            # psum in the transpose for replicated Gaussian inputs) is
            # unaffected
            splat_call = jax.shard_map(
                _splat_shard,
                in_specs=(PS(data_ax, ax),) + (PS(data_ax),) * 5,
                out_specs=(PS(data_ax, ax),) * n_outs,
                check_vma=False)
        else:
            # at inference the splat leaves its outputs in kernel
            # (patch-tile / z-major) row order AND computes final-occ
            # labels in its in-VMEM epilogue (the exact normalize /
            # combine-or-threshold / argmax math below): the float
            # unpatches and the [N, C] label chain feed the output dict
            # only, so they die to DCE when the caller fetches final_occ
            # — ~4.6 ms/frame of full-grid fusions at flagship size
            defer = not training
            emit = dict(
                mode="combine" if self.combine_geosem else "threshold",
                thresh=self.sigmoid_thresh,
                empty_label=self.empty_label)

            def splat_call(pts, m_, o_, s_, sc_, ci_):
                if defer:
                    return splat_deferred(pts, m_, o_, s_, sc_, ci_,
                                          self.grid, emit_labels=emit,
                                          **splat_kw)
                return splat(pts, m_, o_, s_, sc_, ci_, self.grid,
                             **splat_kw), (lambda a: a)

        if shard_vox:
            _inner = splat_call

            def splat_call(pts, m_, o_, s_, sc_, ci_):
                return _inner(pts, m_, o_, s_, sc_, ci_), (lambda a: a)

        prediction, bin_logits, density = [], [], []
        logits_k = bins_k = labels_k = None
        unpatch = lambda a: a  # noqa: E731
        for idx in apply_loss_layers:
            gaussians = representation[idx]
            means, opa, sem, scales, cov_inv6 = self.prepare_gaussian_args(
                gaussians)

            outs, unpatch = splat_call(sampled_xyz, means, opa, sem,
                                       scales, cov_inv6)

            if self.use_localaggprob:
                if len(outs) == 4:          # kernel label epilogue
                    logits, bins, dens, labels_k = outs
                else:
                    logits, bins, dens = outs
                if self.combine_geosem:
                    sem_part = logits[..., :-1] * bins[..., None]
                    geo_part = 1.0 - bins[..., None]
                    logits = jnp.concatenate([sem_part, geo_part], axis=-1)
                logits_k, bins_k = logits, bins
                prediction.append(unpatch(logits))
                bin_logits.append(unpatch(bins))
                density.append(unpatch(dens))
            else:
                if len(outs) == 2:          # kernel label epilogue
                    logits_k, labels_k = outs
                else:
                    logits_k = outs[0]
                prediction.append(unpatch(logits_k))

        if labels_k is not None:
            final_occ = unpatch(labels_k)
        elif self.use_localaggprob and not self.combine_geosem:
            final_sem = jnp.argmax(logits_k, axis=-1)
            occupied = bins_k > self.sigmoid_thresh
            final_occ = unpatch(
                jnp.where(occupied, final_sem, self.empty_label))
        else:
            final_occ = unpatch(jnp.argmax(logits_k, axis=-1))

        return {
            "pred_occ": prediction,
            "bin_logits": bin_logits,
            "density": density,
            "sampled_label": sampled_label,
            "sampled_xyz": sampled_xyz,
            "occ_mask": occ_cam_mask.reshape(b, -1),
            "final_occ": final_occ,
            "gaussian": representation[-1],
            "gaussians": list(representation),
        }
