"""Visualization CLI (reference visualize.py): run val inference and render
predicted/GT occupancy plus the refined Gaussians for a few frames.

    python visualize.py --config prob_gs6400 --work-dir out/prob64 \
        --num-samples 4 [--synthetic] [--scatter3d]
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="prob_gs6400")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data-root", default="data/nuscenes")
    ap.add_argument("--anno-root", default="data/nuscenes_cam")
    ap.add_argument("--occ-path", default="data/surroundocc/samples")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=2)
    ap.add_argument("--scatter3d", action="store_true",
                    help="3D scatter render instead of top-down")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.data import DataLoader
    from gaussianformer_tpu.models import BEVSegmentor
    from gaussianformer_tpu.train.runner import setup_logging
    from gaussianformer_tpu.utils.checkpoint import (latest_checkpoint,
                                                     load_checkpoint)
    from gaussianformer_tpu.utils.vis import (save_occ, save_gaussian,
                                              save_gaussian_topdown)

    setup_logging(args.work_dir)
    cfg = get_config(args.config)
    out_dir = os.path.join(args.work_dir, "vis")
    os.makedirs(out_dir, exist_ok=True)

    if args.synthetic:
        from gaussianformer_tpu.data import SyntheticOccDataset
        ds = SyntheticOccDataset(num_samples=args.num_samples,
                                 image_size=cfg.data.input_size, seed=1)
    else:
        from gaussianformer_tpu.data import NuScenesDataset
        aug = dict(H=900, W=1600, final_dim=cfg.data.input_size,
                   resize_lim=cfg.data.resize_lim, rot_lim=cfg.data.rot_lim,
                   rand_flip=cfg.data.rand_flip)
        ds = NuScenesDataset(
            args.data_root,
            f"{args.anno_root}/nuscenes_infos_val_sweeps_occ.pkl",
            args.occ_path, data_aug_conf=aug, phase="val")

    loader = DataLoader(ds, 1, shuffle=False)
    model = BEVSegmentor(**cfg.segmentor_cfg())
    rng = jax.random.PRNGKey(0)

    first = next(iter(loader))
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        jnp.asarray(first["imgs"]), jnp.asarray(first["projection_mat"]),
        jnp.asarray(first["image_wh"]),
        occ_xyz=jnp.asarray(first["occ_xyz"]),
        occ_label=jnp.asarray(first["occ_label"]),
        occ_cam_mask=jnp.asarray(first["occ_cam_mask"]),
        training=False, rng=rng)

    ckpt = args.ckpt or latest_checkpoint(args.work_dir)
    if ckpt:
        restored = load_checkpoint(ckpt, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": None, "epoch": 0, "global_iter": 0,
            "last_iter": 0})
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}

    apply = jax.jit(model.apply, static_argnames=("training",))
    grid = cfg.splat_grid()
    view = "scatter3d" if args.scatter3d else "topdown"
    for i, batch in enumerate(loader):
        if i >= args.num_samples:
            break
        out = apply(
            variables, jnp.asarray(batch["imgs"]),
            jnp.asarray(batch["projection_mat"]),
            jnp.asarray(batch["image_wh"]),
            occ_xyz=jnp.asarray(batch["occ_xyz"]),
            occ_label=jnp.asarray(batch["occ_label"]),
            occ_cam_mask=jnp.asarray(batch["occ_cam_mask"]),
            training=False, rng=rng)
        pred = np.asarray(out["final_occ"][0]).reshape(
            grid.H, grid.W, grid.D)
        save_occ(os.path.join(out_dir, f"frame{i:04d}_pred.png"), pred,
                 view=view, title=f"pred {i}")
        save_occ(os.path.join(out_dir, f"frame{i:04d}_gt.png"),
                 np.asarray(batch["occ_label"][0]), view=view,
                 title=f"gt {i}")
        g = out["gaussian"]
        save_gaussian_topdown(
            os.path.join(out_dir, f"frame{i:04d}_gaussians.png"),
            g.means[0], g.scales[0], g.semantics[0],
            opacities=(g.opacities[0] if g.opacities.shape[-1] else None),
            pc_range=cfg.pc_range)
        save_gaussian(
            os.path.join(out_dir, f"frame{i:04d}_gaussians3d.png"),
            g.means[0], g.scales[0], g.rotations[0], g.semantics[0],
            opacities=(g.opacities[0] if g.opacities.shape[-1] else None),
            pc_range=cfg.pc_range)
        print(f"rendered frame {i} → {out_dir}")


if __name__ == "__main__":
    main()
