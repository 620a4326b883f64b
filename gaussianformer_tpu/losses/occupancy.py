"""Occupancy loss: weighted CE (+ optional focal/dice/scal) + Lovász.

Parity with reference loss/occupancy_loss.py:102-268. The reference
boolean-indexes `occ_mask` (dynamic shapes); here masked voxels get zero
weight instead — identical means because CE averaging divides by the sum
of participating weights (torch CrossEntropyLoss 'mean' semantics with
class weights) and Lovász uses the masked implementation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lovasz import lovasz_softmax

# nuScenes class frequencies (reference loss/occupancy_loss.py:11-30)
NUSC_CLASS_FREQUENCIES = np.array([
    944004, 1897170, 152386, 2391677, 16957802, 724139, 189027, 2074468,
    413451, 2384460, 5916653, 175883646, 4275424, 51393615, 61411620,
    105975596, 116424404, 1892500630,
], dtype=np.float64)


def balanced_class_weights(num_classes: int,
                           manual: Optional[Sequence[float]] = None):
    """num_classes * L1-normalized(1/log(freq)) (occupancy_loss.py:85-92)."""
    if manual is not None:
        w = np.asarray(manual, np.float64)
    else:
        w = 1.0 / np.log(NUSC_CLASS_FREQUENCIES[:num_classes] + 0.001)
    w = num_classes * w / np.abs(w).sum()
    return jnp.asarray(w, jnp.float32)


@dataclasses.dataclass(frozen=True)
class OccupancyLossCfg:
    num_classes: int = 18
    empty_label: int = 17
    ce_weight: float = 10.0
    lovasz_weight: float = 1.0
    lovasz_ignore: int = 17
    lovasz_use_softmax: bool = False   # False: inputs are probabilities
    ignore_empty: bool = False
    use_lovasz: bool = True
    use_sem_geo_scal: bool = False
    sem_scal_weight: float = 1.0
    geo_scal_weight: float = 1.0
    manual_class_weight: Optional[Tuple[float, ...]] = None
    balance_cls_weight: bool = True
    use_focal: bool = False           # CustomFocalLoss replaces the CE
    focal_use_sigmoid: bool = True
    use_dice: bool = False
    dice_weight: float = 2.0


def weighted_ce_with_softmax(logits, labels, class_weights, valid):
    """torch.nn.CrossEntropyLoss(weight, 'mean') parity: weighted NLL
    normalized by the summed weights of participating targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels] * valid
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_ce_probs(probs, labels, class_weights, valid):
    """CE_wo_softmax (occupancy_loss.py:180-183): NLL on clamped probs."""
    probs = jnp.clip(probs, 1e-6, 1.0 - 1e-6)
    picked = jnp.take_along_axis(
        jnp.log(probs), labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels] * valid
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-12)


def _scal_bce_of_ratio(r):
    """BCE(inverse_sigmoid(r), 1) == -log(r) with the reference's clamped
    inverse-sigmoid round trip (occupancy_loss.py:157-162)."""
    r = jnp.clip(r, 1e-5, 1.0 - 1e-5)
    return -jnp.log(r)


def sem_scal_loss(probs, labels, valid, num_classes: int):
    """Per-class precision/recall/specificity BCE (occupancy_loss.py:185)."""
    validf = valid.astype(probs.dtype)

    # python loop over classes (see losses/lovasz.py: vmap over these
    # bodies leaks tracers under grad in jax 0.9.0)
    losses = []
    present = []
    for ci in range(num_classes - 1):
        p = probs[:, ci] * validf
        t = (labels == ci).astype(probs.dtype) * validf
        nom = jnp.sum(p * t)
        sum_p = jnp.sum(p)
        sum_t = jnp.sum(t)
        sum_not_t = jnp.sum(validf) - sum_t
        loss = jnp.where(sum_p > 0, _scal_bce_of_ratio(nom / (sum_p + 1e-5)),
                         0.0)
        loss += jnp.where(sum_t > 0,
                          _scal_bce_of_ratio(nom / (sum_t + 1e-5)), 0.0)
        spec = jnp.sum((validf - p) * (validf - t)) / (sum_not_t + 1e-5)
        loss += jnp.where(sum_not_t > 0, _scal_bce_of_ratio(spec), 0.0)
        pres = sum_t > 0
        losses.append(jnp.where(pres, loss, 0.0))
        present.append(pres)

    losses = jnp.stack(losses)
    present = jnp.stack(present)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1)


def geo_scal_loss(probs, labels, valid, empty_label: int):
    """Binary geometric completeness BCEs (occupancy_loss.py:241-268)."""
    validf = valid.astype(probs.dtype)
    empty_p = probs[:, empty_label]
    nonempty_p = (1.0 - empty_p) * validf
    nonempty_t = ((labels != empty_label).astype(probs.dtype)) * validf
    intersection = jnp.sum(nonempty_t * nonempty_p)
    precision = intersection / (jnp.sum(nonempty_p) + 1e-5)
    recall = intersection / (jnp.sum(nonempty_t) + 1e-5)
    spec = (jnp.sum((validf - nonempty_t) * empty_p * validf)
            / (jnp.sum(validf - nonempty_t) + 1e-5))
    return (_scal_bce_of_ratio(precision) + _scal_bce_of_ratio(recall)
            + _scal_bce_of_ratio(spec))


def occupancy_loss(cfg: OccupancyLossCfg, pred_occ, sampled_label, occ_mask,
                   sampled_xyz=None):
    """pred_occ: list of [B, N, C] (probs if not lovasz_use_softmax, else
    logits); sampled_label [B, N]; occ_mask [B, N] bool; sampled_xyz only
    needed for the distance-weighted focal variant."""
    class_weights = balanced_class_weights(
        cfg.num_classes, cfg.manual_class_weight
        if cfg.balance_cls_weight else
        [1.0] * cfg.num_classes)

    valid = occ_mask
    if cfg.ignore_empty:
        valid = valid & (sampled_label != cfg.empty_label)

    tot = 0.0
    for semantics in pred_occ:
        b, n, c = semantics.shape
        flat = semantics.reshape(b * n, c)
        labels = sampled_label.reshape(b * n)
        vf = valid.reshape(b * n).astype(jnp.float32)

        if cfg.use_focal:
            from .focal import distance_weighted_focal_loss
            assert sampled_xyz is not None
            ce = distance_weighted_focal_loss(
                semantics, sampled_label, sampled_xyz,
                use_sigmoid=cfg.focal_use_sigmoid,
                class_weights=class_weights)
            probs = (flat if not cfg.lovasz_use_softmax
                     else jax.nn.softmax(flat, axis=-1))
        elif cfg.lovasz_use_softmax:
            ce = weighted_ce_with_softmax(flat, labels, class_weights, vf)
            probs = jax.nn.softmax(flat, axis=-1)
        else:
            ce = weighted_ce_probs(flat, labels, class_weights, vf)
            probs = flat
        loss = cfg.ce_weight * ce

        if cfg.use_sem_geo_scal:
            loss += cfg.sem_scal_weight * sem_scal_loss(
                probs, labels, vf > 0, cfg.num_classes)
            loss += cfg.geo_scal_weight * geo_scal_loss(
                probs, labels, vf > 0, cfg.empty_label)

        if cfg.use_lovasz:
            lv_valid = (vf > 0) & (labels != cfg.lovasz_ignore)
            loss += cfg.lovasz_weight * lovasz_softmax(
                probs, labels, lv_valid)
        if cfg.use_dice:
            from .focal import dice_loss
            loss += cfg.dice_weight * dice_loss(
                probs, labels, class_weights=class_weights, valid=vf > 0)
        tot = tot + loss
    return tot / len(pred_occ)
