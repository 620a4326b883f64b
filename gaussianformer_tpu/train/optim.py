"""Optimizer / schedule construction.

Parity with the reference training recipe (train.py:107-122 +
config optimizer blocks): AdamW, per-module lr multipliers
(img_backbone x0.1), global grad-norm clip 35, cosine schedule with
500-iter linear warmup from 1e-6 to base lr, decaying to lr*min_ratio.
Frozen modules (freeze_lifter, BN stats, frozen_stages) get zero updates
via the same label mechanism.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import optax


def cosine_warmup_schedule(base_lr: float, total_steps: int,
                           warmup_steps: int = 500,
                           warmup_init: float = 1e-6,
                           min_lr_ratio: float = 0.1):
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_init,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * min_lr_ratio,
    )


def param_labels(params, backbone_prefixes: Sequence[str] = ("img_backbone",),
                 frozen_prefixes: Sequence[str] = ()):
    """Label each leaf 'backbone' / 'frozen' / 'default' by its path."""

    def label_of(path, _):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(k) for k in keys)
        for pref in frozen_prefixes:
            if joined.startswith(pref) or f"/{pref}" in joined:
                return "frozen"
        for pref in backbone_prefixes:
            if joined.startswith(pref) or f"/{pref}" in joined:
                return "backbone"
        return "default"

    return jax.tree_util.tree_map_with_path(label_of, params)


def multistep_schedule(base_lr: float, milestones: Sequence[int],
                       gamma: float = 0.1, warmup_steps: int = 500,
                       warmup_init: float = 1e-6):
    """Step-decay schedule with linear warmup (reference
    MultiStepLRScheduler option, train.py:111-115)."""
    def sched(step):
        import jax.numpy as jnp
        lr = base_lr
        factor = jnp.ones((), jnp.float32)
        for m in milestones:
            factor = factor * jnp.where(step >= m, gamma, 1.0)
        warm = warmup_init + (base_lr - warmup_init) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0)
        return jnp.where(step < warmup_steps, warm, base_lr * factor)
    return sched


def build_optimizer(params, base_lr: float, total_steps: int, *,
                    weight_decay: float = 0.01,
                    backbone_lr_mult: float = 0.1,
                    grad_max_norm: float = 35.0,
                    warmup_steps: int = 500,
                    min_lr_ratio: float = 0.1,
                    frozen_prefixes: Sequence[str] = (),
                    grad_accumulation: int = 1,
                    milestones: Optional[Sequence[int]] = None):
    if milestones:
        sched = multistep_schedule(base_lr, milestones,
                                   warmup_steps=warmup_steps)
        sched_backbone = multistep_schedule(
            base_lr * backbone_lr_mult, milestones,
            warmup_steps=warmup_steps,
            warmup_init=1e-6 * backbone_lr_mult)
    else:
        sched = cosine_warmup_schedule(base_lr, total_steps, warmup_steps,
                                       min_lr_ratio=min_lr_ratio)
        sched_backbone = cosine_warmup_schedule(
            base_lr * backbone_lr_mult, total_steps, warmup_steps,
            warmup_init=1e-6 * backbone_lr_mult, min_lr_ratio=min_lr_ratio)

    def adamw(s):
        return optax.adamw(s, weight_decay=weight_decay, b1=0.9, b2=0.999)

    tx = optax.multi_transform(
        {
            "default": adamw(sched),
            "backbone": adamw(sched_backbone),
            "frozen": optax.set_to_zero(),
        },
        param_labels(params, frozen_prefixes=frozen_prefixes),
    )
    tx = optax.chain(optax.clip_by_global_norm(grad_max_norm), tx)
    if grad_accumulation > 1:
        # the reference steps the optimizer every `grad_accumulation`
        # iterations (train.py:219-230); optax.MultiSteps is the jit-safe
        # equivalent
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accumulation)
    return tx, sched
