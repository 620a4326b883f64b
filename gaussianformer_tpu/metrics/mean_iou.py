"""Mean IoU over semantic classes + binary occupancy IoU.

Parity with reference misc/metric_util.py:9-111 (class_indices 1..16,
empty label 17, camera-visibility mask, `filter_minmax=False`). The
per-step counter update is a pure jittable function; accumulation happens
host-side (or via `jax.lax.psum` when sharded — see
gaussianformer_tpu.parallel).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NUSC_LABELS = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]


def iou_counts(outputs, targets, mask, class_indices, empty_label: int):
    """Per-class (seen, correct, positive) counters + binary-occ counters.

    outputs/targets: [N] int; mask: [N] bool. Returns [C+1, 3] int32.
    """
    cls = jnp.asarray(class_indices, jnp.int32)
    validf = mask

    def per_class(c):
        t = (targets == c) & validf
        o = (outputs == c) & validf
        return jnp.stack([jnp.sum(t), jnp.sum(t & o), jnp.sum(o)])

    per = jax.vmap(per_class)(cls)
    t = (targets != empty_label) & validf
    o = (outputs != empty_label) & validf
    occ = jnp.stack([jnp.sum(t), jnp.sum(t & o), jnp.sum(o)])[None]
    return jnp.concatenate([per, occ], axis=0).astype(jnp.int64)


def compute_iou(counts):
    """counts: [C+1, 3] → (miou%, occ_iou%, per-class ious).

    Classes never seen get IoU 1 (reference metric_util.py:92-95)."""
    counts = np.asarray(counts, np.float64)
    seen, correct, positive = counts[:-1, 0], counts[:-1, 1], counts[:-1, 2]
    union = seen + positive - correct
    ious = np.where(seen == 0, 1.0,
                    correct / np.maximum(union, 1e-12))
    occ_seen, occ_corr, occ_pos = counts[-1]
    occ_iou = occ_corr / max(occ_seen + occ_pos - occ_corr, 1e-12)
    return float(np.mean(ious) * 100.0), float(occ_iou * 100.0), ious


class MeanIoU:
    """Stateful accumulator mirroring the reference API."""

    def __init__(self, class_indices: Optional[Sequence[int]] = None,
                 empty_label: int = 17,
                 label_str: Optional[Sequence[str]] = None,
                 use_mask: bool = True):
        self.class_indices = list(class_indices or range(1, 17))
        self.empty_label = empty_label
        self.label_str = list(label_str or NUSC_LABELS)
        self.use_mask = use_mask
        self.reset()

    def reset(self):
        self.counts = np.zeros((len(self.class_indices) + 1, 3), np.int64)

    def counts_for(self, outputs, targets, mask=None):
        """Dispatch the per-step counter math and return the (device)
        result WITHOUT synchronizing — lets an eval loop queue the
        counter update behind the forward and defer the host transfer
        one step (Trainer.evaluate overlap), mirroring the reference's
        CUDA-async metric update (eval.py:146-163)."""
        if mask is None or not self.use_mask:
            mask = jnp.ones(np.shape(outputs), bool)
        return iou_counts(jnp.ravel(outputs), jnp.ravel(targets),
                          jnp.ravel(mask), self.class_indices,
                          self.empty_label)

    def add_counts(self, c):
        """Accumulate a :meth:`counts_for` result (synchronizes)."""
        self.counts += np.asarray(c)

    def update(self, outputs, targets, mask=None):
        self.add_counts(self.counts_for(outputs, targets, mask))

    def result(self, distributed: bool = False):
        """distributed=True sums counters across processes first
        (reference dist.all_reduce, metric_util.py:69-73)."""
        counts = self.counts
        if distributed:
            from ..parallel.distributed import all_reduce_sum_host
            counts = all_reduce_sum_host(counts)
        return compute_iou(counts)
