"""Binary / distribution losses (reference loss/bce_loss.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_loss(bin_logits_list, sampled_label, occ_mask,
                              empty_label: int = 17,
                              class_weights=(1.0, 1.0)):
    """BCE on superposed occupancy probability vs non-empty GT
    (reference BinaryCrossEntropyLoss:9-56). ``bin_logits`` are
    probabilities (despite the name)."""
    w = jnp.asarray(class_weights, jnp.float32)
    w = 2.0 * w / jnp.sum(jnp.abs(w))
    target = (sampled_label != empty_label)
    sample_w = jnp.where(target, w[1], w[0])
    validf = occ_mask.astype(jnp.float32)

    tot = 0.0
    for probs in bin_logits_list:
        p = jnp.clip(probs, 1e-6, 1.0 - 1e-6)
        bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1.0 - p))
        bce = bce * sample_w * validf
        tot = tot + jnp.sum(bce) / jnp.maximum(jnp.sum(validf), 1.0)
    return tot


def occ_depth_loss(pixel_logits, pixel_gt):
    """CE against the argmax-depth bin of the per-ray occupancy ground
    truth (reference OccDepthLoss:90-114; unused in shipped configs)."""
    import jax
    depth_gt = jnp.argmax(pixel_gt.astype(jnp.float32), axis=-1)
    logp = jax.nn.log_softmax(pixel_logits, axis=-1)
    picked = jnp.take_along_axis(logp, depth_gt[..., None], axis=-1)
    return -jnp.mean(picked)


def density_loss(density_list, sampled_label, occ_mask,
                 empty_label: int = 17, thresh: float = 0.0):
    """Encourage density above `thresh` at occupied voxels and below at
    empty ones (reference config comment, config/prob/nuscenes_gs6400.py:
    66-69; hinge form)."""
    occupied = (sampled_label != empty_label)
    validf = occ_mask.astype(jnp.float32)
    tot = 0.0
    for density in density_list:
        hinge = jnp.where(occupied, jnp.maximum(thresh - density, 0.0),
                          jnp.maximum(density - thresh, 0.0))
        tot = tot + jnp.sum(hinge * validf) / jnp.maximum(
            jnp.sum(validf), 1.0)
    return tot


def pixel_distribution_loss(pixel_logits, pixel_gt, use_sigmoid: bool = False):
    """BCE(softmax(logits) or sigmoid(logits), pixel occupancy gt) —
    supervises the v2 initializer distribution (reference
    PixelDistributionLoss:60-87)."""
    if use_sigmoid:
        p = jax.nn.sigmoid(pixel_logits)
    else:
        p = jax.nn.softmax(pixel_logits, axis=-1)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    t = pixel_gt.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return jnp.mean(bce)
