"""Jitted train / eval steps with loss composition.

The hot loop of the reference (train.py:185-332) becomes one jitted,
mesh-sharded function: forward → loss → grad → clip → AdamW update.
Gradient mean across data-parallel shards is implicit in sharded autodiff.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs.nuscenes import GaussianFormerConfig, MANUAL_CLASS_WEIGHT
from ..losses.occupancy import OccupancyLossCfg, occupancy_loss
from ..losses.bce import pixel_distribution_loss
from ..losses.multi_loss import MultiLoss, LossTerm


def build_loss(cfg: GaussianFormerConfig) -> MultiLoss:
    """Loss stack per config (reference loss= blocks)."""
    occ_cfg = OccupancyLossCfg(
        num_classes=cfg.num_classes,
        empty_label=cfg.empty_label,
        ce_weight=cfg.ce_weight,
        lovasz_weight=cfg.lovasz_weight,
        lovasz_ignore=17,
        lovasz_use_softmax=cfg.lovasz_use_softmax,
        manual_class_weight=MANUAL_CLASS_WEIGHT,
        balance_cls_weight=True,
    )
    terms = [
        LossTerm(
            name="OccupancyLoss", weight=1.0,
            fn=functools.partial(occupancy_loss, occ_cfg),
            input_keys=("pred_occ", "sampled_label", "occ_mask")),
    ]
    if cfg.use_pixel_distribution_loss:
        terms.append(LossTerm(
            name="PixelDistributionLoss", weight=1.0,
            fn=functools.partial(pixel_distribution_loss, use_sigmoid=False),
            input_keys=("pixel_logits", "pixel_gt")))
    return MultiLoss(terms)


def make_train_step(model, loss_fn: MultiLoss,
                    donate: bool = True) -> Callable:
    """Returns jitted train_step(state, batch, rng) → (state, metrics)."""

    def train_step(state, batch, rng):
        def compute_loss(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["projection_mat"], batch["image_wh"],
                occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"],
                training=True, rng=rng,
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            loss, logs = loss_fn(out)
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, **logs,
                   "grad_norm": optax_global_norm(grads)}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model) -> Callable:
    def eval_step(params, batch_stats, batch, rng):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["projection_mat"], batch["image_wh"],
            occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
            occ_cam_mask=batch["occ_cam_mask"],
            training=False, rng=rng)
        return {
            "final_occ": out["final_occ"],
            "sampled_label": out["sampled_label"],
            "occ_mask": out["occ_mask"],
        }

    return jax.jit(eval_step)
