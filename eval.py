"""Eval CLI (reference eval.py): run val inference + MeanIoU.

    python eval.py --config prob_gs6400 --work-dir out/prob64 \
        [--ckpt PATH | latest in work-dir] [--synthetic]
"""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="prob_gs6400")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data-root", default="data/nuscenes")
    ap.add_argument("--anno-root", default="data/nuscenes_cam")
    ap.add_argument("--occ-path", default="data/surroundocc/samples")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0,
                    help="evaluate only N samples (0 = all)")
    args = ap.parse_args()

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.data import DataLoader
    from gaussianformer_tpu.data.loader import ShardedSampler
    from gaussianformer_tpu.parallel.distributed import init_distributed
    from gaussianformer_tpu.train.runner import Trainer, setup_logging
    from gaussianformer_tpu.utils.checkpoint import (latest_checkpoint,
                                                     load_checkpoint)

    proc_id, num_procs = init_distributed()
    setup_logging(args.work_dir if proc_id == 0 else None)
    cfg = get_config(args.config)

    if args.synthetic:
        from gaussianformer_tpu.data import SyntheticOccDataset
        val_ds = SyntheticOccDataset(
            num_samples=args.num_samples or 2,
            image_size=cfg.data.input_size, seed=1)
    else:
        from gaussianformer_tpu.data import NuScenesDataset
        aug = dict(H=900, W=1600, final_dim=cfg.data.input_size,
                   resize_lim=cfg.data.resize_lim, rot_lim=cfg.data.rot_lim,
                   rand_flip=cfg.data.rand_flip)
        val_ds = NuScenesDataset(
            args.data_root,
            f"{args.anno_root}/nuscenes_infos_val_sweeps_occ.pkl",
            args.occ_path, data_aug_conf=aug, phase="val")

    val_loader = DataLoader(val_ds, cfg.data.batch_size,
                            sampler=ShardedSampler(
                                len(val_ds), shard_id=proc_id,
                                num_shards=num_procs, shuffle=False),
                            num_workers=args.num_workers)
    trainer = Trainer(cfg, val_loader, val_loader, args.work_dir)
    trainer.init_state(next(iter(val_loader)), inference_only=True)

    ckpt = args.ckpt or latest_checkpoint(args.work_dir)
    if ckpt:
        restored = load_checkpoint(ckpt)  # full tree; pick weights only
        trainer._state = trainer._state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"])

    # size the Pallas DCN window to THIS checkpoint before the val loop:
    # out-of-margin offsets silently drop samples (auto-widen), and the
    # kernel costs ~3x less VPU/MXU work at the narrowest window the
    # offsets permit (auto-narrow; value-exact — eval has no offset
    # gradients). Same failure class gate for the deformable spill
    # budget.
    batch0 = next(iter(val_loader))
    trainer.verify_dcn_margin(batch0, allow_narrow=True)
    trainer.verify_deformable_spill(batch0)

    miou, occ_iou = trainer.evaluate()
    print(f"mIoU: {miou:.2f}%  occupancy IoU: {occ_iou:.2f}%")


if __name__ == "__main__":
    main()
