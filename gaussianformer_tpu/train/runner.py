"""Training / evaluation runners (reference train.py / eval.py).

The hot loop is one jitted, mesh-sharded train step; the host loop does
data feeding, logging, checkpointing, and per-epoch eval — matching the
reference flow (train.py:185-332) without DDP machinery.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.nuscenes import GaussianFormerConfig
from ..metrics.mean_iou import MeanIoU
from ..models.segmentor import BEVSegmentor
from ..parallel.mesh import (make_mesh, replicate, shard_batch,
                             shard_global_batch)
from ..utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                save_checkpoint)
from .optim import build_optimizer
from .step import build_loss, make_eval_step, optax_global_norm
from .train_state import create_train_state

logger = logging.getLogger("gaussianformer_tpu")


def setup_logging(work_dir: Optional[str] = None):
    handlers = [logging.StreamHandler()]
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
        handlers.append(logging.FileHandler(
            os.path.join(work_dir, "train.log")))
    logging.basicConfig(level=logging.INFO, handlers=handlers,
                        format="%(asctime)s %(levelname)s %(message)s",
                        force=True)


class Trainer:
    def __init__(self, cfg: GaussianFormerConfig, train_loader, val_loader,
                 work_dir: str, *, seed: int = 0, print_freq: int = 50,
                 grad_accumulation: int = 1, use_mesh: bool = True,
                 iter_resume: bool = False):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.work_dir = work_dir
        self.print_freq = print_freq
        self.grad_accumulation = grad_accumulation
        self.iter_resume = iter_resume
        self.model = BEVSegmentor(**cfg.segmentor_cfg())
        self.loss_fn = build_loss(cfg)
        self.seed = seed
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = make_mesh() if use_mesh else None

        self.epoch = 0
        self.global_iter = 0
        self._state = None

    # -------------------------------------------------------------- setup
    def init_state(self, example_batch, inference_only: bool = False):
        """Build the train state. ``inference_only`` skips the optimizer
        (the reference eval path also builds one, eval.py:100-110 — here
        eval holds params/batch_stats only)."""
        rng = self.rng
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(example_batch["imgs"]),
            jnp.asarray(example_batch["projection_mat"]),
            jnp.asarray(example_batch["image_wh"]),
            occ_xyz=jnp.asarray(example_batch["occ_xyz"]),
            occ_label=jnp.asarray(example_batch["occ_label"]),
            occ_cam_mask=jnp.asarray(example_batch["occ_cam_mask"]),
            training=True, rng=rng)
        if inference_only:
            import optax
            state = create_train_state(variables, optax.identity())
            if self.mesh is not None:
                state = replicate(self.mesh, state)
            self._state = state
            self.schedule = lambda _: 0.0
            self._make_steps()
            return state
        total_steps = len(self.train_loader) * self.cfg.optim.max_epochs
        # frozen_stages=1 (reference backbone config): stem + stage 1
        frozen = ["img_backbone/conv1", "img_backbone/bn1",
                  "img_backbone/stage1"]
        if self.cfg.freeze_lifter:
            # reference freeze_lifter keeps random_anchors trainable
            # (bev_segmentor.py:40-46); freeze the initializer tower and
            # learned anchors but not random_anchors.
            frozen += ["lifter/initialize_backbone", "lifter/projection",
                       "lifter/anchor", "lifter/instance_feature"]
        tx, self.schedule = build_optimizer(
            variables["params"], self.cfg.optim.lr, total_steps,
            weight_decay=self.cfg.optim.weight_decay,
            backbone_lr_mult=self.cfg.optim.backbone_lr_mult,
            grad_max_norm=self.cfg.optim.grad_max_norm,
            warmup_steps=self.cfg.optim.warmup_iters,
            min_lr_ratio=self.cfg.optim.min_lr_ratio,
            frozen_prefixes=tuple(frozen),
            grad_accumulation=self.grad_accumulation)
        state = create_train_state(variables, tx)
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        self._state = state
        self._make_steps()
        return state

    def _make_steps(self):
        model, loss_fn = self.model, self.loss_fn

        def train_step(state, batch, rng, apply_loss_layers=None):
            def compute_loss(params):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["imgs"], batch["projection_mat"],
                    batch["image_wh"], occ_xyz=batch["occ_xyz"],
                    occ_label=batch["occ_label"],
                    occ_cam_mask=batch["occ_cam_mask"],
                    training=True, rng=rng,
                    apply_loss_layers=apply_loss_layers,
                    rngs={"dropout": jax.random.fold_in(rng, 1)})
                loss, logs = loss_fn(out)
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            metrics = {"loss": loss, **logs,
                       "grad_norm": optax_global_norm(grads)}
            return new_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0,),
                                   static_argnums=(3,))
        self._eval_step = make_eval_step(model)

    def _mesh_ctx(self):
        """Ambient abstract-mesh context for jitted step calls: lets
        mesh-aware modules (GaussianHead.voxel_shard_axis) see the mesh
        axes during tracing; inert for a data-only mesh."""
        if self.mesh is not None:
            return jax.sharding.use_abstract_mesh(self.mesh.abstract_mesh)
        import contextlib
        return contextlib.nullcontext()

    def _draw_loss_layers(self):
        """Host-side supervised-layer draw for ``random_k`` with k > 1
        (reference gaussian_head.py:133-137: k-1 uniform picks from the
        first num_decoder-1 layers, plus the last). Static tuple → one
        compiled step variant per layer subset (C(D-1, k-1) variants).
        Returns None when the head's static selection suffices.

        The draw is seeded from (cfg seed, global_iter) so every data-
        parallel process draws the SAME subset: an unseeded per-process
        draw would make ranks compile/run different step programs around
        the cross-process gradient collective (hang / undefined results),
        and would not be reproducible from the config seed."""
        alt = self.cfg.apply_loss_type
        if not alt.startswith("random_"):
            return None
        k = int(alt.split("_")[1])
        if k <= 1:
            return None
        d = self.cfg.num_decoder
        rs = np.random.RandomState((self.seed * 1_000_003 + self.global_iter)
                                   % (2 ** 31 - 1))
        extra = rs.choice(d - 1, k - 1, replace=False)
        return tuple(sorted(extra.tolist() + [d - 1]))

    def load_torch_pretrained(self, backbone_path: Optional[str] = None,
                              lifter_init_path: Optional[str] = None,
                              check_margin: bool = True):
        """Load reference PyTorch pretrains into the live state:
        ``backbone_path`` = r101_dcn_fcos3d_pretrain.pth (reference
        load_from, train.py:156-167), ``lifter_init_path`` = the
        GaussianLifterV2 initializer (init.pth, reference
        gaussian_lifter_v2.py:109-117, anchor/instance_feature dropped).

        ``check_margin``: after loading, run one forward over the first
        train/val batch collecting per-DCN-block max |offset| and verify
        it fits the Pallas kernel's static window (``cfg.dcn_win``);
        out-of-margin offsets would silently drop samples (value AND
        gradient), so the model is rebuilt with a wider window instead
        (see :meth:`verify_dcn_margin`)."""
        import torch
        from ..utils.torch_convert import (convert_backbone_and_neck,
                                           convert_initializer, merge_into)
        variables = {"params": self._state.params,
                     "batch_stats": self._state.batch_stats}
        if backbone_path:
            sd = torch.load(backbone_path, map_location="cpu",
                            weights_only=False)
            sd = sd.get("state_dict", sd)
            params, stats = convert_backbone_and_neck(sd)
            variables = merge_into(variables, params, stats)
            logger.info("loaded backbone pretrain from %s", backbone_path)
        if lifter_init_path:
            sd = torch.load(lifter_init_path, map_location="cpu",
                            weights_only=False)
            sd = sd.get("state_dict", sd)
            sd = {k: v for k, v in sd.items()
                  if k not in ("anchor", "instance_feature")}
            params, stats = convert_initializer(sd)
            variables = merge_into(
                variables,
                {"lifter": {"initialize_backbone": params}},
                {"lifter": {"initialize_backbone": stats}})
            logger.info("loaded lifter initializer from %s",
                        lifter_init_path)
        self._state = self._state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"])
        if check_margin and (backbone_path or lifter_init_path):
            loader = self.train_loader or self.val_loader
            if loader is not None:
                batch = next(iter(loader))
                self.verify_dcn_margin(batch)
                self.verify_deformable_spill(batch)
            else:
                logger.warning(
                    "load_torch_pretrained: no loader available to "
                    "verify the DCN offset margin / deformable spill "
                    "budget — run Trainer.verify_dcn_margin(batch) and "
                    "Trainer.verify_deformable_spill(batch) before "
                    "training (out-of-margin offsets and over-budget "
                    "spills silently drop samples).")

    def verify_dcn_margin(self, batch, *, auto_widen: bool = True,
                          allow_narrow: bool = False):
        """Check the loaded checkpoint's DCN offsets against the Pallas
        kernel's representable window (utils.check_dcn_offset_margin).

        Out-of-margin offsets are a silent-wrong-features hazard: the
        fused kernel drops bilinear corners beyond ±(win-2*tile)/2 px of
        their static tap. On failure this either rebuilds the model with
        the next sufficient window (``auto_widen=True``, steps re-jitted;
        parameters are unaffected — the window is a static kernel shape)
        or raises naming the ``cfg.dcn_win`` knob.

        ``allow_narrow=True`` (inference only): when the measured offsets
        permit a SMALLER window than configured, rebuild with it — the
        kernel's sampling matmul and M-build shrink ~(win-8)*win-fold.
        Value-exact; never use for training (offset gradients need
        corners one pixel past the value margin)."""
        import dataclasses

        from ..utils import check_dcn_offset_margin, suggest_dcn_win
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        res = check_dcn_offset_margin(
            self.model, {"params": self._state.params,
                         "batch_stats": self._state.batch_stats},
            batch, win=self.cfg.dcn_win)
        if res["ok"]:
            logger.info("DCN offset margin OK: max |offset| %.2f px <= "
                        "margin %.2f px (dcn_win=%d)", res["max_offset"],
                        res["margin"], self.cfg.dcn_win)
            narrower = suggest_dcn_win(res["max_offset"])
            if allow_narrow and narrower < self.cfg.dcn_win:
                logger.info(
                    "narrowing dcn_win %d -> %d for inference (max "
                    "|offset| %.2f px; value-exact)", self.cfg.dcn_win,
                    narrower, res["max_offset"])
                self._rebuild_with_dcn_win(narrower)
                res = dict(res, dcn_win=narrower)
            return res
        needed = suggest_dcn_win(res["max_offset"])
        if not auto_widen:
            raise ValueError(
                f"DCN offsets out of margin: max |offset| "
                f"{res['max_offset']:.2f} px > margin {res['margin']:.2f} "
                f"px for dcn_win={self.cfg.dcn_win}. Rebuild with config "
                f"dcn_win={needed} (dataclasses.replace(cfg, "
                f"dcn_win={needed})) or samples will be silently "
                f"dropped.")
        logger.error(
            "DCN offsets out of margin: max |offset| %.2f px > margin "
            "%.2f px (dcn_win=%d). Rebuilding the model with dcn_win=%d "
            "— parameters unchanged, steps re-jitted.", res["max_offset"],
            res["margin"], self.cfg.dcn_win, needed)
        self._rebuild_with_dcn_win(needed)
        return check_dcn_offset_margin(
            self.model, {"params": self._state.params,
                         "batch_stats": self._state.batch_stats},
            batch, win=needed)

    def _rebuild_with_dcn_win(self, win: int):
        """Clone the live model (not rebuild from cfg, so module
        overrides survive) with a different Pallas DCN window; the
        window is a static kernel shape, not a parameter."""
        import dataclasses
        self.cfg = dataclasses.replace(self.cfg, dcn_win=win)
        backbone_cfg = dict(self.model.backbone_cfg or {})
        backbone_cfg["dcn_win"] = win
        lifter_cfg = dict(self.model.lifter_cfg or {})
        if self.model.lifter_type == "v2":
            lifter_cfg["dcn_win"] = win
        self.model = self.model.clone(backbone_cfg=backbone_cfg,
                                      lifter_cfg=lifter_cfg)
        self._make_steps()

    def verify_deformable_spill(self, batch, *, strict: bool = True):
        """Check the deformable kernel's window-spill count against its
        exact-cleanup budget (utils.check_deformable_spill).

        Pairs beyond the budget are silently dropped in the fused
        backend; a checkpoint whose projected keypoints spill more than
        budget loses attention mass with no error. Raises when over
        budget (``strict=True``; warns otherwise) naming the
        ``spill_budget`` knob (encoder deformable_cfg)."""
        from ..utils import check_deformable_spill
        enc_cfg = dict(self.model.encoder_cfg or {})
        budget = dict(enc_cfg.get("deformable_cfg") or {}).get(
            "spill_budget", 8192)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        res = check_deformable_spill(
            self.model, {"params": self._state.params,
                         "batch_stats": self._state.batch_stats},
            batch, budget=budget)
        if res["ok"]:
            logger.info(
                "deformable spill OK: max %d spilled pairs <= budget %d "
                "(%.1f%% used)", res["max_spill"], budget,
                100.0 * res["max_spill"] / max(budget, 1))
            return res
        msg = (f"deformable window spill over budget: {res['max_spill']} "
               f"spilled pairs > spill_budget={budget} — pairs beyond "
               f"the budget are DROPPED (silent attention-mass loss). "
               f"Raise encoder deformable_cfg['spill_budget'] (counts "
               f"per call: {res['per_call']}).")
        if strict:
            raise ValueError(msg)
        logger.error(msg)
        return res

    # ------------------------------------------------------------- resume
    def try_resume(self):
        path = latest_checkpoint(self.work_dir)
        if path is None or self._state is None:
            return False
        restored = load_checkpoint(path, {
            "params": self._state.params,
            "batch_stats": self._state.batch_stats,
            "opt_state": self._state.opt_state,
            "epoch": 0, "global_iter": 0, "last_iter": 0,
        })
        self._state = self._state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"])
        self.epoch = int(restored["epoch"])
        self.global_iter = int(restored["global_iter"])
        last_iter = int(restored.get("last_iter", 0))
        if last_iter and hasattr(self.train_loader.sampler,
                                 "set_last_iter"):
            # mid-epoch fast-forward (reference CustomDistributedSampler,
            # dataset/sampler.py:112-118)
            self.train_loader.sampler.set_last_iter(
                last_iter * self.train_loader.batch_size)
        logger.info("resumed from %s at epoch %d iter %d", path, self.epoch,
                    self.global_iter)
        return True

    def save(self, last_iter: int = 0):
        if jax.process_index() != 0:
            # rank-0-only checkpointing (reference train.py:253-281)
            return
        save_checkpoint(self.work_dir, self.global_iter, {
            "params": self._state.params,
            "batch_stats": self._state.batch_stats,
            "opt_state": self._state.opt_state,
            "epoch": self.epoch, "global_iter": self.global_iter,
            "last_iter": last_iter,
        })

    def _log_scalars(self, metrics, lr):
        """Scalar metrics stream (replaces the reference's TensorBoard
        WrappedTBWriter singleton, misc/tb_wrapper.py): one JSON line per
        logging step in <work_dir>/metrics.jsonl."""
        rec = {"epoch": self.epoch, "iter": self.global_iter, "lr": lr,
               "time": time.time(), **metrics}
        with open(os.path.join(self.work_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -------------------------------------------------------------- train
    def fit(self):
        first = next(iter(self.train_loader))
        if self._state is None:
            self.init_state(first)
            self.try_resume()

        while self.epoch < self.cfg.optim.max_epochs:
            if hasattr(self.train_loader.sampler, "set_epoch"):
                self.train_loader.sampler.set_epoch(self.epoch)
            t_data = time.time()
            for i, batch in enumerate(self.train_loader):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.mesh is not None:
                    batch = shard_global_batch(self.mesh, batch)
                data_time = time.time() - t_data
                self.rng, step_rng = jax.random.split(self.rng)
                with self._mesh_ctx():
                    self._state, metrics = self._train_step(
                        self._state, batch, step_rng,
                        self._draw_loss_layers())
                self.global_iter += 1
                if i % self.print_freq == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    lr = float(self.schedule(self.global_iter))
                    logger.info(
                        "epoch %d iter %d loss %.4f grad %.2f lr %.2e "
                        "data %.2fs step %.2fs", self.epoch, i,
                        metrics["loss"], metrics["grad_norm"], lr,
                        data_time, time.time() - t_data - data_time)
                    self._log_scalars(metrics, lr)
                if (self.iter_resume and self.global_iter % 50 == 0):
                    # iteration-level checkpoint for mid-epoch resume
                    # (reference --iter-resume, train.py:253-267)
                    self.save(last_iter=i + 1)
                t_data = time.time()
            self.epoch += 1
            self.save()
            if self.val_loader is not None:
                self.evaluate()

    # --------------------------------------------------------------- eval
    def evaluate(self):
        """Validation loop with one-step host/device overlap: while the
        device runs batch n's forward + counter math, the host fetches
        and converts batch n+1 (the loader's prefetch threads fill
        further ahead) and synchronizes only batch n-1's tiny counter
        arrays — nothing full-sized crosses the wire on the critical
        path (reference analog: DataLoader workers + CUDA async,
        eval.py:138-167)."""
        miou = MeanIoU()
        pending = None          # batch n-1 counters, still on device
        it = iter(self.val_loader)
        nxt = next(it, None)
        while nxt is not None:
            batch = {k: jnp.asarray(v) for k, v in nxt.items()}
            self.rng, step_rng = jax.random.split(self.rng)
            with self._mesh_ctx():
                out = self._eval_step(self._state.params,
                                  self._state.batch_stats, batch, step_rng)
                # queue the counter math behind the forward (device-side,
                # no sync)
                counts = [miou.counts_for(out["final_occ"][b],
                                          out["sampled_label"][b],
                                          out["occ_mask"][b])
                          for b in range(out["final_occ"].shape[0])]
            nxt = next(it, None)            # overlap: load batch n+1
            if pending is not None:
                for c in pending:           # sync point: batch n-1 only
                    miou.add_counts(c)
            pending = counts
        if pending is not None:
            for c in pending:
                miou.add_counts(c)
        # cross-process counter reduction (reference metric_util.py:69-73)
        m, occ_iou, per_class = miou.result(
            distributed=jax.process_count() > 1)
        if jax.process_index() == 0:
            logger.info("val mIoU %.2f%%  occ IoU %.2f%%", m, occ_iou)
            for name, iou in zip(miou.label_str, per_class):
                logger.info("  %s: %.2f%%", name, iou * 100)
        return m, occ_iou
