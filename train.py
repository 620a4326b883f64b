"""Train CLI (reference train.py).

    python train.py --config prob_gs6400 --work-dir out/prob64 \
        --data-root data/nuscenes --anno-root data/nuscenes_cam \
        --occ-path data/surroundocc/samples

With --synthetic, trains on random data (pipeline smoke test)."""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="prob_gs6400")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--data-root", default="data/nuscenes")
    ap.add_argument("--anno-root", default="data/nuscenes_cam")
    ap.add_argument("--occ-path", default="data/surroundocc/samples")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-samples", type=int, default=8)
    ap.add_argument("--print-freq", type=int, default=50)
    ap.add_argument("--num-workers", type=int, default=4,
                    help="data-loading threads (0 = synchronous); the "
                         "reference torch DataLoader num_workers analog")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backbone-pretrain", default=None,
                    help="torch ckpt for backbone+neck "
                         "(r101_dcn_fcos3d_pretrain.pth)")
    ap.add_argument("--lifter-init-ckpt", default=None,
                    help="torch ckpt for the v2 lifter initializer "
                         "(init.pth)")
    args = ap.parse_args()

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.data import DataLoader
    from gaussianformer_tpu.data.loader import ShardedSampler
    from gaussianformer_tpu.parallel.distributed import init_distributed
    from gaussianformer_tpu.train.runner import Trainer, setup_logging

    proc_id, num_procs = init_distributed()
    setup_logging(args.work_dir if proc_id == 0 else None)
    cfg = get_config(args.config)
    batch_size = args.batch_size or cfg.data.batch_size

    if args.synthetic:
        from gaussianformer_tpu.data import SyntheticOccDataset
        train_ds = SyntheticOccDataset(num_samples=args.synthetic_samples,
                                       image_size=cfg.data.input_size)
        val_ds = SyntheticOccDataset(num_samples=2,
                                     image_size=cfg.data.input_size, seed=1)
    else:
        from gaussianformer_tpu.data import NuScenesDataset
        aug = dict(H=900, W=1600,
                   final_dim=cfg.data.input_size,
                   resize_lim=cfg.data.resize_lim,
                   rot_lim=cfg.data.rot_lim,
                   rand_flip=cfg.data.rand_flip)
        train_ds = NuScenesDataset(
            args.data_root,
            f"{args.anno_root}/nuscenes_infos_train_sweeps_occ.pkl",
            args.occ_path, data_aug_conf=aug, phase="train", seed=args.seed)
        val_ds = NuScenesDataset(
            args.data_root,
            f"{args.anno_root}/nuscenes_infos_val_sweeps_occ.pkl",
            args.occ_path, data_aug_conf=aug, phase="val")

    # per-process data shards (reference CustomDistributedSampler,
    # dataset/sampler.py:12-137)
    train_loader = DataLoader(train_ds, batch_size, sampler=ShardedSampler(
        len(train_ds), shard_id=proc_id, num_shards=num_procs,
        shuffle=True, seed=args.seed), num_workers=args.num_workers)
    val_loader = DataLoader(val_ds, batch_size, sampler=ShardedSampler(
        len(val_ds), shard_id=proc_id, num_shards=num_procs,
        shuffle=False), num_workers=args.num_workers)

    trainer = Trainer(cfg, train_loader, val_loader, args.work_dir,
                      seed=args.seed, print_freq=args.print_freq)
    if args.backbone_pretrain or args.lifter_init_ckpt:
        trainer.init_state(next(iter(train_loader)))
        trainer.load_torch_pretrained(args.backbone_pretrain,
                                      args.lifter_init_ckpt)
        trainer.try_resume()
    trainer.fit()


if __name__ == "__main__":
    main()
