"""Data-pipeline throughput bench (reference num_workers analog,
dataset/__init__.py:30-53).

Measures samples/s of the full CPU input pipeline at nuScenes scale —
6 x 900x1600 JPEG decode + resize/crop/flip homography + photometric
HSV + normalize — synchronous vs thread-pool prefetch, plus the
overlap gain against a simulated accelerator step.

    python tools/bench_loader.py [--workers 4] [--samples 16]

Writes one JSON line; no TPU needed.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gaussianformer_tpu.data import transforms as T  # noqa: E402
from gaussianformer_tpu.data.loader import DataLoader  # noqa: E402


class JpegOccDataset:
    """nuScenes-shaped synthetic sample: 6 on-disk JPEGs (real decode
    cost) + the real transform pipeline + a 200x200x16 label grid."""

    def __init__(self, root, num_samples=16, num_cams=6,
                 image_size=(900, 1600), final_dim=(864, 1600),
                 grid=(200, 200, 16), seed=0):
        self.root = root
        self.num_samples = num_samples
        self.num_cams = num_cams
        self.final_dim = final_dim
        self.grid = grid
        self.image_size = image_size
        rng = np.random.RandomState(seed)
        from PIL import Image
        self.paths = []
        for c in range(num_cams):
            arr = rng.randint(0, 255, image_size + (3,), np.uint8)
            p = os.path.join(root, f"cam{c}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            self.paths.append(p)
        self.rng = np.random.RandomState(seed)
        import threading
        self._rng_lock = threading.Lock()

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index):
        from PIL import Image
        with self._rng_lock:
            rng = np.random.RandomState(self.rng.randint(2 ** 31))
        imgs = [np.asarray(Image.open(p).convert("RGB"))
                for p in self.paths]
        lidar2img = np.broadcast_to(
            np.eye(4), (self.num_cams, 4, 4)).copy()
        aug = T.sample_augmentation(
            rng, H=self.image_size[0], W=self.image_size[1],
            final_dim=self.final_dim, resize_lim=(1.0, 1.0),
            bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0), rand_flip=True,
            test_mode=False)
        imgs, lidar2img, shapes = T.resize_crop_flip(imgs, aug, lidar2img)
        imgs = [T.photometric_distortion(im, rng) for im in imgs]
        img = T.normalize_images(
            imgs, mean=(123.675, 116.28, 103.53),
            std=(58.395, 57.12, 57.375))
        x, y, z = self.grid
        return {
            "imgs": img,
            "projection_mat": lidar2img.astype(np.float32),
            "image_wh": np.asarray(shapes, np.float32)[:, ::-1].copy(),
            "occ_label": rng.randint(0, 18, (x, y, z)).astype(np.int32),
            "occ_cam_mask": np.ones((x, y, z), bool),
            "occ_xyz": np.zeros((x, y, z, 3), np.float32),
        }


def run(loader, step_s=0.0, warm=1):
    it = iter(loader)
    for _ in range(warm):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        if step_s:
            time.sleep(step_s)  # simulated accelerator step
        n += batch["imgs"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--step-ms", type=float, default=250.0,
                    help="simulated train-step time for the overlap run")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        ds = JpegOccDataset(root, num_samples=args.samples)
        sync_sps = run(DataLoader(ds, 1, shuffle=False))
        pre_sps = run(DataLoader(ds, 1, shuffle=False,
                                 num_workers=args.workers, prefetch=2))
        # overlap: per-iteration wall time with a simulated step; a
        # prefetching loader should hide data time behind the step
        step_s = args.step_ms / 1000.0
        sync_it = 1.0 / run(DataLoader(ds, 1, shuffle=False),
                            step_s=step_s)
        pre_it = 1.0 / run(DataLoader(ds, 1, shuffle=False,
                                      num_workers=args.workers,
                                      prefetch=2), step_s=step_s)
        print(json.dumps({
            "metric": "loader_samples_per_s",
            "sync": round(sync_sps, 3),
            "prefetch": round(pre_sps, 3),
            "workers": args.workers,
            "speedup": round(pre_sps / sync_sps, 2),
            "iter_s_with_step_sync": round(sync_it, 3),
            "iter_s_with_step_prefetch": round(pre_it, 3),
            "step_s": step_s,
            "overlap_hidden_frac": round(
                min(1.0, max(0.0, (sync_it - pre_it)
                             / max(sync_it - step_s, 1e-9))), 2),
        }))


if __name__ == "__main__":
    main()
